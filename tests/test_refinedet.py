"""RefineDet: prior grid + two-step decode semantics + graph smoke."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_priors_match_reference_count_and_range():
    from tensorrtx_tpu.models.refinedet import priors

    m = get_model("refinedet")
    pri = priors(m.default_cfg())
    assert pri.shape == (6375, 4)          # refinedet.cpp:592
    assert (pri >= 0).all() and (pri <= 1).all()
    # first cell of the 40x40 grid, square anchor: s_k = 32/320
    np.testing.assert_allclose(pri[0], [0.5 / 40, 0.5 / 40, 0.1, 0.1],
                               atol=1e-6)


def test_two_step_decode_refines_priors():
    from tensorrtx_tpu.models.refinedet import _ssd_decode, priors

    m = get_model("refinedet")
    pri = priors(m.default_cfg())[:4]
    loc = np.array([[1.0, 0.0, 0.0, 0.0]] * 4, np.float32)
    ref = _ssd_decode(loc, pri)
    # variance 0.1: cx shifts by 0.1*w
    np.testing.assert_allclose(ref[0, 0], pri[0, 0] + 0.1 * pri[0, 2],
                               rtol=1e-5)
    # second step decodes against the REFINED anchor, not the original
    again = _ssd_decode(loc, ref)
    assert again[0, 0] > ref[0, 0]


def test_refinedet_graph(rng):
    model = get_model("refinedet")
    cfg = model.default_cfg()
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 320, 320, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    n = sum(f * f * 3 for f in (40, 20, 10, 5))
    assert out["arm_loc"].shape == (1, n, 4)
    assert out["odm_conf"].shape == (1, n, 25)
    np.testing.assert_allclose(np.asarray(out["arm_conf"]).sum(-1), 1.0,
                               atol=1e-4)
    dets = model.postprocess(out, dataclasses.replace(cfg, conf_thresh=0.2))[0]
    assert isinstance(dets, list)
