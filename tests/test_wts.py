import numpy as np

from tensorrtx_tpu.core.wts import load_wts, save_wts
from tensorrtx_tpu.core.params import WeightMap


def test_wts_roundtrip(tmp_path, rng):
    tensors = {
        "conv1.weight": rng.standard_normal((6, 1, 5, 5)).astype(np.float32),
        "conv1.bias": rng.standard_normal(6).astype(np.float32),
        "fc.weight": rng.standard_normal((10, 20)).astype(np.float32),
    }
    p = tmp_path / "m.wts"
    save_wts(str(p), tensors)
    loaded = load_wts(str(p))
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k].reshape(-1))


def test_wts_matches_gen_wts_encoding(tmp_path):
    # gen_wts.py writes struct.pack('>f', v).hex(); verify exact token format.
    import struct

    save_wts(str(tmp_path / "x.wts"), {"w": np.array([1.0, -2.5], np.float32)})
    line = (tmp_path / "x.wts").read_text().splitlines()[1]
    toks = line.split()
    assert toks[0] == "w" and toks[1] == "2"
    assert toks[2] == struct.pack(">f", 1.0).hex()
    assert toks[3] == struct.pack(">f", -2.5).hex()


def test_weightmap_conv_bn_fold(rng):
    c = 4
    w = rng.standard_normal((c, 3, 3, 3)).astype(np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
    raw = {
        "m.conv.weight": w.reshape(-1),
        "m.bn.weight": gamma, "m.bn.bias": beta,
        "m.bn.running_mean": mean, "m.bn.running_var": var,
    }
    wm = WeightMap(raw)
    p = wm.conv_bn("m.conv", "m.bn", c, 3, (3, 3), eps=1e-3)
    # Folded conv on an input must equal conv→BN applied separately.
    import jax.numpy as jnp
    from tensorrtx_tpu.ops import nn

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    y_folded = nn.conv2d(x, jnp.asarray(p["w"]), jnp.asarray(p["b"]), padding=1)
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    y_raw = nn.conv2d(x, w_hwio, None, padding=1)
    scale = gamma / np.sqrt(var + 1e-3)
    shift = beta - mean * scale
    y_bn = y_raw * scale + shift
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_bn), atol=1e-4)
