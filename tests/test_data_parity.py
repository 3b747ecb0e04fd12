"""Data-layer parity tests with torch oracles + masked-batch semantics."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

RNG = np.random.RandomState(0)


pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

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


class TestMMIMDBTextLoading:
    """data/mmimdb.py text handling: (T,300) sequences mean-pool, bad shapes
    raise — never silent truncation to the first word vector."""

    def _write_sample(self, d, idx, text):
        np.save(d / f"image_{idx:06}.npy", RNG.randn(8, 8, 3).astype(np.float32))
        np.save(d / f"text_{idx:06}.npy", text.astype(np.float32))
        np.save(d / f"label_{idx:06}.npy", np.zeros(23, np.float32))

    def _dataset(self, tmp_path, text):
        from bmnas_tpu.data.mmimdb import MMIMDBDataset
        d = tmp_path / "dev"
        d.mkdir()
        self._write_sample(d, 0, text)
        return MMIMDBDataset(str(tmp_path), "dev", length=1, use_native=False)

    def test_flat_vector_passthrough(self, tmp_path):
        t = RNG.randn(300).astype(np.float32)
        s = self._dataset(tmp_path, t).load_sample(0)
        np.testing.assert_array_equal(s["text"], t)

    def test_sequence_mean_pools(self, tmp_path):
        t = RNG.randn(7, 300).astype(np.float32)
        s = self._dataset(tmp_path, t).load_sample(0)
        np.testing.assert_allclose(s["text"], t.mean(axis=0), rtol=1e-6)

    def test_wrong_width_raises(self, tmp_path):
        with pytest.raises(ValueError, match="expected 300"):
            self._dataset(tmp_path, RNG.randn(512)).load_sample(0)


class TestNTUFilenameAlignment:
    """data/ntu.py constructor must reject rgb/skeleton list misalignment."""

    def _mk(self, root, names, skip_skeleton=None):
        rgb = root / "nturgb+d_rgb_256x256_30"
        ske = root / "nturgb+d_skeletons"
        rgb.mkdir()
        ske.mkdir()
        for n in names:
            np.save(str(rgb / f"{n}_rgb.npy"),
                    np.zeros((4, 16, 16, 3), np.float32))
            # numpy appends .npy; rename to the exact expected name
            if n != skip_skeleton:
                (ske / f"{n}.skeleton").write_text("0\n")

    def test_missing_skeleton_raises(self, tmp_path):
        from bmnas_tpu.data.ntu import NTUDataset
        names = ["S001C001P001R001A001", "S001C001P008R001A002"]
        self._mk(tmp_path, names, skip_skeleton=names[1])
        with pytest.raises(ValueError, match="mismatch"):
            NTUDataset(str(tmp_path), "train_exp")

    def test_aligned_ok(self, tmp_path):
        from bmnas_tpu.data.ntu import NTUDataset
        names = ["S001C001P001R001A001", "S001C001P008R001A002"]
        self._mk(tmp_path, names)
        ds = NTUDataset(str(tmp_path), "train_exp")
        assert len(ds) == 2


class TestNbpeCeil:
    def test_num_batches_is_ceil(self):
        """nbpe passed to the cosine scheduler = ceil(N/B), matching the
        reference's len(dataloader) (mmimdb_darts_searchable.py:29-30)."""
        assert -(-15552 // 8) == 1944           # exact division
        assert -(-100 // 96) == 2               # NTU-style remainder
        assert -(-191 // 96) == 2


class TestUint8DeviceNormalization:
    """The uint8 H2D path (ship raw bytes, normalize on device) must equal
    the legacy fp32 host normalization bit-for-bit through the full model."""

    def test_batches_ship_uint8_and_logits_match_host_norm(self, tmp_path):
        import jax
        import numpy as np

        from bmnas_tpu.data.ntu import NTUDataset
        from bmnas_tpu.data.synthetic import make_ntu_synthetic
        from bmnas_tpu.models.ntu import SearchableSkeletonImageNet
        from bmnas_tpu.models.supernet import init_arch_params

        root = make_ntu_synthetic(str(tmp_path), hw=32, frames=70)
        kw = dict(num_workers=2)
        ds_dev = NTUDataset(root, "train", **kw)
        ds_host = NTUDataset(root, "train", host_image_norm=True, **kw)

        b_dev = next(iter(ds_dev.batches(4, shuffle=False)))
        b_host = next(iter(ds_host.batches(4, shuffle=False)))
        assert b_dev["image"].dtype == np.uint8
        assert b_host["image"].dtype == np.float32
        np.testing.assert_array_equal(b_dev["skeleton"], b_host["skeleton"])

        model = SearchableSkeletonImageNet(
            C=8, L=4, steps=2, multiplier=2, node_steps=1, node_multiplier=1,
            num_input_nodes=8, num_keep_edges=2, num_outputs=6, drpt=0.0)
        arch = init_arch_params(jax.random.PRNGKey(1), 2, 8, 1)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(2)}, b_dev, arch, False)
        out_dev = np.asarray(model.apply(v, b_dev, arch, False))
        out_host = np.asarray(model.apply(v, b_host, arch, False))
        np.testing.assert_allclose(out_dev, out_host, rtol=1e-5, atol=1e-5)

    def test_mixed_uint8_float_sources_normalize_consistently(self, tmp_path):
        """A split mixing raw-uint8 and float (pre-normalized) npy sources
        must not silently cast one into the other's dtype: the uint8
        minority is host-normalized so the whole batch is one fp32 space."""
        import numpy as np

        from bmnas_tpu.data.ntu import NTUDataset
        from bmnas_tpu.data.synthetic import make_ntu_synthetic

        root = make_ntu_synthetic(str(tmp_path), n_videos_per_subject=2,
                                  subjects=(1, 8), hw=32, frames=70)
        # convert one train clip to the float fallback format (already
        # normalized values, as a legacy fixture would carry)
        import glob
        import os
        rgb_dir = os.path.join(root, "nturgb+d_rgb_256x256_30")
        f0 = sorted(glob.glob(os.path.join(rgb_dir, "*_rgb.npy")))[0]
        raw = np.load(f0).astype(np.float32)
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        np.save(f0, ((raw / 255.0) - mean) / std)

        ds = NTUDataset(root, "train", num_workers=2)
        b = next(iter(ds.batches(4, shuffle=False)))
        assert b["image"].dtype == np.float32
        # every row is in normalized space (raw uint8 would sit in [0, 255])
        assert np.abs(b["image"]).max() < 10.0


class TestEgoUint8DeviceNormalization:
    """Ego's uint8 H2D path (ship raw bytes incl. padded-row masking,
    normalize on device) must equal the legacy fp32 host mean-subtract
    bit-for-bit through the full searchable net."""

    def test_batches_ship_uint8_and_logits_match_host_norm(self, tmp_path):
        import jax

        from bmnas_tpu.data.ego import EgoDataset
        from bmnas_tpu.data.synthetic import make_ego_synthetic
        from bmnas_tpu.models.ego import SearchableRGBDepthNet
        from bmnas_tpu.models.supernet import init_arch_params

        ann = make_ego_synthetic(str(tmp_path), n_per_subset=3, hw=48,
                                 frames=12)
        kw = dict(sample_size=32, sample_duration=8, num_workers=2,
                  train_transform=True)
        ds_dev = EgoDataset(str(tmp_path), ann, "training", **kw)
        ds_host = EgoDataset(str(tmp_path), ann, "training",
                             host_image_norm=True, **kw)

        # batch of 4 from 3 samples: the 4th row is PADDING (mask 0) — the
        # device path must zero it after mean-subtract, like the host path
        b_dev = next(iter(ds_dev.batches(4, shuffle=False)))
        b_host = next(iter(ds_host.batches(4, shuffle=False)))
        assert b_dev["rgb"].dtype == np.uint8
        assert b_dev["depth"].dtype == np.uint8
        assert b_host["rgb"].dtype == np.float32
        assert b_dev["mask"][-1] == 0.0

        model = SearchableRGBDepthNet(
            C=8, L=4, steps=2, multiplier=2, node_steps=1, node_multiplier=1,
            num_input_nodes=8, num_keep_edges=2, num_outputs=5, drpt=0.0)
        arch = init_arch_params(jax.random.PRNGKey(1), 2, 8, 1)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(2)}, b_dev, arch, False)
        out_dev = np.asarray(model.apply(v, b_dev, arch, False))
        out_host = np.asarray(model.apply(v, b_host, arch, False))
        np.testing.assert_allclose(out_dev, out_host, rtol=1e-5, atol=1e-5)


class TestJpegDecoderParity:
    """data/ego._load_jpg decodes via cv2 (libjpeg-turbo) when available,
    PIL otherwise — the two must produce identical uint8 pixels, else the
    decode speedup would silently change the training data."""

    def test_cv2_and_pil_decode_identically(self, tmp_path):
        import bmnas_tpu.data.ego as ego_mod
        from bmnas_tpu.data.synthetic import make_ego_synthetic

        if ego_mod.cv2 is None:
            pytest.skip("cv2 not available")
        make_ego_synthetic(str(tmp_path), n_per_subset=1, frames=2, hw=40)
        jpgs = []
        for dirpath, _, files in __import__("os").walk(tmp_path):
            jpgs += [f"{dirpath}/{f}" for f in files if f.endswith(".jpg")]
        assert jpgs, "synthetic corpus wrote no frames"
        real_cv2 = ego_mod.cv2
        for path in jpgs:
            gray = "Depth" in path
            via_cv2 = ego_mod._load_jpg(path, gray)
            try:
                ego_mod.cv2 = None  # force the PIL fallback
                via_pil = ego_mod._load_jpg(path, gray)
            finally:
                ego_mod.cv2 = real_cv2
            assert via_cv2.dtype == np.uint8 and via_cv2.shape == via_pil.shape
            np.testing.assert_array_equal(via_cv2, via_pil)

    def _both_paths(self, ego_mod, path, gray):
        via_cv2 = ego_mod._load_jpg(path, gray)
        real_cv2 = ego_mod.cv2
        try:
            ego_mod.cv2 = None
            via_pil = ego_mod._load_jpg(path, gray)
        finally:
            ego_mod.cv2 = real_cv2
        return via_cv2, via_pil

    def test_exif_orientation_is_ignored_like_pil(self, tmp_path):
        """Real EgoGesture frames can carry EXIF orientation tags; the
        reference decode (PIL Image.open().convert()) never applies them,
        while cv2's default flags DO — which would silently rotate the
        training data (ADVICE r04). Both modes must ignore the tag."""
        import bmnas_tpu.data.ego as ego_mod
        from PIL import Image

        if ego_mod.cv2 is None:
            pytest.skip("cv2 not available")
        rng = np.random.RandomState(0)
        img = Image.fromarray(rng.randint(0, 255, (30, 44, 3), np.uint8))
        exif = Image.Exif()
        exif[274] = 6  # Orientation: rotate 90 CW on honor
        path = str(tmp_path / "exif.jpg")
        img.save(path, exif=exif)
        for gray in (False, True):
            via_cv2, via_pil = self._both_paths(ego_mod, path, gray)
            assert via_cv2.shape == via_pil.shape  # (30, 44, .) — unrotated
            np.testing.assert_array_equal(via_cv2, via_pil)

    def test_color_encoded_grayscale_matches_pil_convert_L(self, tmp_path):
        """A depth frame re-encoded as a COLOR JPEG (3-channel YCbCr):
        cv2.IMREAD_GRAYSCALE's codec-internal luma differs by +-1 LSB from
        PIL convert('L'); the gray path must detect the color encoding and
        produce PIL-exact pixels (ADVICE r04)."""
        import bmnas_tpu.data.ego as ego_mod
        from PIL import Image

        if ego_mod.cv2 is None:
            pytest.skip("cv2 not available")
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
        path = str(tmp_path / "colorgray.jpg")
        Image.fromarray(arr).save(path, quality=95)
        via_cv2, via_pil = self._both_paths(ego_mod, path, True)
        assert via_cv2.shape == via_pil.shape == (32, 32, 1)
        np.testing.assert_array_equal(via_cv2, via_pil)
