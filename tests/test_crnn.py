"""CRNN parity vs a torch reference (meijieru crnn.pytorch layout) — the
closest analog of the repo's only real unit test, tsm/test_shift.py."""

import numpy as np
import torch
import torch.nn as tnn

import jax.numpy as jnp

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.ops.rnn import bilstm
from tensorrtx_tpu.ops.ctc import ctc_greedy_decode
from torch_refs.yolo11_torch import randomize


def test_bilstm_matches_torch(rng):
    T, B, I, H = 7, 2, 12, 8
    torch.manual_seed(3)
    m = tnn.LSTM(I, H, bidirectional=True).eval()
    x = rng.normal(0, 1, (T, B, I)).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(x))
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    fwd = {"w_ih": sd["weight_ih_l0"], "w_hh": sd["weight_hh_l0"],
           "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"]}
    bwd = {"w_ih": sd["weight_ih_l0_reverse"], "w_hh": sd["weight_hh_l0_reverse"],
           "b_ih": sd["bias_ih_l0_reverse"], "b_hh": sd["bias_hh_l0_reverse"]}
    import jax

    fwd = jax.tree.map(jnp.asarray, fwd)
    bwd = jax.tree.map(jnp.asarray, bwd)
    got = np.asarray(bilstm(jnp.asarray(x), fwd, bwd))
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-5)


class BidirectionalLSTM(tnn.Module):
    def __init__(self, nIn, nHidden, nOut):
        super().__init__()
        self.rnn = tnn.LSTM(nIn, nHidden, bidirectional=True)
        self.embedding = tnn.Linear(nHidden * 2, nOut)

    def forward(self, x):
        rec, _ = self.rnn(x)
        T, b, h = rec.size()
        out = self.embedding(rec.view(T * b, h))
        return out.view(T, b, -1)


class TorchCRNN(tnn.Module):
    def __init__(self, nclass=37, nh=256):
        super().__init__()
        ks = [3, 3, 3, 3, 3, 3, 2]
        ps = [1, 1, 1, 1, 1, 1, 0]
        ss = [1, 1, 1, 1, 1, 1, 1]
        nm = [64, 128, 256, 256, 512, 512, 512]
        cnn = tnn.Sequential()
        cin = 1

        def convRelu(i, bn=False):
            nonlocal cin
            cnn.add_module(f"conv{i}", tnn.Conv2d(cin, nm[i], ks[i], ss[i], ps[i]))
            if bn:
                cnn.add_module(f"batchnorm{i}", tnn.BatchNorm2d(nm[i]))
            cnn.add_module(f"relu{i}", tnn.ReLU(True))
            cin = nm[i]

        convRelu(0)
        cnn.add_module("pooling0", tnn.MaxPool2d(2, 2))
        convRelu(1)
        cnn.add_module("pooling1", tnn.MaxPool2d(2, 2))
        convRelu(2, True)
        convRelu(3)
        cnn.add_module("pooling2", tnn.MaxPool2d((2, 2), (2, 1), (0, 1)))
        convRelu(4, True)
        convRelu(5)
        cnn.add_module("pooling3", tnn.MaxPool2d((2, 2), (2, 1), (0, 1)))
        convRelu(6, True)
        self.cnn = cnn
        self.rnn = tnn.Sequential(
            BidirectionalLSTM(512, nh, nh),
            BidirectionalLSTM(nh, nh, nclass))

    def forward(self, x):
        conv = self.cnn(x)
        conv = conv.squeeze(2)          # (B, 512, T)
        conv = conv.permute(2, 0, 1)    # (T, B, 512)
        return self.rnn(conv)


def test_crnn_parity(tmp_path, rng):
    tm = randomize(TorchCRNN(), seed=17).eval()
    wts = tmp_path / "crnn.wts"
    state_dict_to_wts(str(wts), {k.replace("cnn.cnn.", "cnn."): v
                                 for k, v in tm.state_dict().items()})
    eng = build_engine("crnn", str(wts))
    x = rng.uniform(0, 1, (1, 1, 32, 100)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()   # (T=26, 1, 37)
    out = eng(np.transpose(x, (0, 2, 3, 1)))
    got = np.asarray(out["logits"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3)
    # decode path end-to-end
    from tensorrtx_tpu.models.crnn import decode_text, ALPHABET

    text = decode_text(out)
    ids = ref.argmax(-1)[:, 0]
    exp, _ = ctc_greedy_decode(ids, None, ALPHABET)
    assert text == exp
