"""Data-layer parity tests with torch oracles + masked-batch semantics."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

RNG = np.random.RandomState(0)


class TestNTUInterpole:
    @pytest.mark.parametrize("t_in,t_out", [(70, 32), (32, 32), (20, 32)])
    def test_matches_torch_bilinear(self, t_in, t_out):
        """_linear_interp_T == the reference's interpole (datasets/ntu.py:
        109-116): 2D bilinear resize of (C*V*M, T) -> (T', 1),
        align_corners=False."""
        from bmnas_tpu.data.ntu import _linear_interp_T
        data = RNG.randn(3, t_in, 25, 2).astype(np.float32)
        got = _linear_interp_T(data, t_out)

        C, T, V, M = data.shape
        td = torch.from_numpy(data).permute(0, 2, 3, 1).contiguous().view(
            C * V * M, T)[None, :, :, None]
        want = F.interpolate(td, size=(t_out, 1), mode="bilinear",
                             align_corners=False)
        want = want.squeeze(3).squeeze(0).view(C, V, M, t_out).permute(
            0, 3, 1, 2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestMaskedBatchSemantics:
    def test_masked_loss_equals_dynamic_batch(self):
        """A padded+masked final batch must produce exactly the loss/counts
        the reference gets from its dynamic-size final batch."""
        from bmnas_tpu.search.bilevel import bce_with_logits, cross_entropy
        from bmnas_tpu.utils.metrics import multilabel_counts

        n, b, c = 5, 8, 4  # 5 real rows padded to 8
        logits = RNG.randn(b, c).astype(np.float32)
        labels = (RNG.rand(b, c) < 0.5).astype(np.float32)
        mask = np.zeros(b, np.float32)
        mask[:n] = 1

        got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels),
                                    jnp.asarray(mask)))
        want = float(F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits[:n]), torch.from_numpy(labels[:n])))
        assert got == pytest.approx(want, rel=1e-5)

        int_labels = RNG.randint(0, c, b).astype(np.int32)
        got_ce = float(cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(int_labels),
                                     jnp.asarray(mask)))
        want_ce = float(F.cross_entropy(
            torch.from_numpy(logits[:n]),
            torch.from_numpy(int_labels[:n].astype(np.int64))))
        assert got_ce == pytest.approx(want_ce, rel=1e-5)

        preds = (RNG.rand(b, c) < 0.5).astype(np.float32)
        counts = multilabel_counts(jnp.asarray(preds), jnp.asarray(labels),
                                   jnp.asarray(mask))
        want_tp = (preds[:n] * labels[:n]).sum(axis=0)
        np.testing.assert_allclose(np.asarray(counts["tp"]), want_tp)
        assert float(counts["count"]) == n


class TestNormalizeTransform:
    def test_rgbd_quirk(self):
        """Normalize zips 3 means against 4 channels: depth untouched
        (the reference's torch Normalize zip behaviour)."""
        from bmnas_tpu.data.transforms import Normalize
        img = RNG.rand(8, 8, 4).astype(np.float32) * 255
        t = Normalize([114.7748, 107.7354, 99.475], [1, 1, 1])
        out = t(img)
        np.testing.assert_allclose(out[..., 3], img[..., 3])
        np.testing.assert_allclose(out[..., 0], img[..., 0] - 114.7748,
                                   rtol=1e-5)
