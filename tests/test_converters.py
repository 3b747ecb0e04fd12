"""Checkpoint-converter tests against reference-layout state dicts.

Builds synthetic torch state dicts with the reference's key names and shapes
(central/ntu.py:56-115 for HCN, Visual = cnn.*/classifier.* with
resnet/bottleneck.py layer structure, ego.py ResNeXt-101), converts them,
and checks shape-validated loading plus that loaded weights actually reach
the forward pass.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

RNG = np.random.RandomState(0)


pytestmark = pytest.mark.quick  # fast subset: python -m pytest -m quick

def t(shape):
    return torch.from_numpy(RNG.randn(*shape).astype(np.float32))


def hcn_state_dict(num_outputs=60):
    sd = {}
    def conv(name, o, i, kh, kw):
        sd[f"{name}.weight"] = t((o, i, kh, kw))
        sd[f"{name}.bias"] = t((o,))
    conv("conv1.0", 64, 3, 1, 1)
    conv("conv2", 32, 64, 3, 1)
    conv("conv3.0", 32, 25, 3, 3)
    conv("conv4.0", 64, 32, 3, 3)
    conv("conv1m.0", 64, 3, 1, 1)
    conv("conv2m", 32, 64, 3, 1)
    conv("conv3m.0", 32, 25, 3, 3)
    conv("conv4m.0", 64, 32, 3, 3)
    conv("conv5.0", 128, 128, 3, 3)
    conv("conv6.0", 256, 128, 3, 3)
    sd["fc7.0.weight"] = t((512, 1024))
    sd["fc7.0.bias"] = t((512,))
    sd["fc8.weight"] = t((num_outputs, 512))
    sd["fc8.bias"] = t((num_outputs,))
    return sd


class TestHCNConverter:
    def test_load_and_forward_changes(self, tmp_path):
        from bmnas_tpu.models.hcn import HCN
        from bmnas_tpu.utils.torch_convert import convert_hcn, load_torch_state_dict

        model = HCN(num_outputs=60, drpt=0.1)
        x = jnp.asarray(RNG.randn(2, 32, 25, 2, 3).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, False)
        sd = hcn_state_dict()
        path = str(tmp_path / "ske.checkpoint")
        torch.save(sd, path)
        new_params = convert_hcn(load_torch_state_dict(path), v["params"])
        out0 = model.apply(v, x, False)
        out1 = model.apply({"params": new_params,
                            "batch_stats": v.get("batch_stats", {})}, x, False)
        # loaded weights must change the output but stay finite
        assert np.isfinite(np.asarray(out1[1])).all()
        assert not np.allclose(np.asarray(out0[1]), np.asarray(out1[1]))
        # fc7 conversion used the flatten permutation: kernel shape (1024, 512)
        assert new_params["fc7"]["kernel"].shape == (1024, 512)

    def test_shape_mismatch_raises(self, tmp_path):
        from bmnas_tpu.models.hcn import HCN
        from bmnas_tpu.utils.torch_convert import convert_hcn
        model = HCN(num_outputs=60, drpt=0.1)
        x = jnp.asarray(RNG.randn(1, 32, 25, 2, 3).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, False)
        sd = hcn_state_dict()
        sd["conv2.weight"] = t((99, 64, 3, 1))  # wrong out channels
        with pytest.raises(AssertionError):
            convert_hcn({k: v_.numpy() for k, v_ in sd.items()}, v["params"])


def visual_state_dict(num_outputs=60):
    sd = {}
    def bn(name, c):
        sd[f"{name}.weight"] = t((c,))
        sd[f"{name}.bias"] = t((c,))
        sd[f"{name}.running_mean"] = t((c,))
        sd[f"{name}.running_var"] = torch.abs(t((c,))) + 0.5
    sd["cnn.conv1.weight"] = t((64, 3, 7, 7))
    bn("cnn.bn1", 64)
    layers = [3, 4, 6, 3]
    channels = [64, 128, 256, 512]
    inplanes = 64
    for stage, (planes, blocks) in enumerate(zip(channels, layers), start=1):
        for b in range(blocks):
            pre = f"cnn.layer{stage}.{b}"
            sd[f"{pre}.conv1.weight"] = t((planes, inplanes, 1, 1, 1))
            bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = t((planes, planes, 3, 3, 3))
            bn(f"{pre}.bn2", planes)
            sd[f"{pre}.conv3.weight"] = t((planes * 4, planes, 1, 1, 1))
            bn(f"{pre}.bn3", planes * 4)
            if b == 0 and (stage > 1 or inplanes != planes * 4):
                sd[f"{pre}.downsample.0.weight"] = t((planes * 4, inplanes, 1, 1, 1))
                bn(f"{pre}.downsample.1", planes * 4)
            inplanes = planes * 4
    sd["classifier.weight"] = t((num_outputs, 2048))
    sd["classifier.bias"] = t((num_outputs,))
    return sd


class TestVisualConverter:
    def test_load_and_forward(self, tmp_path):
        from bmnas_tpu.models.ntu import Visual
        from bmnas_tpu.utils.torch_convert import convert_visual

        model = Visual(num_outputs=60)
        x = jnp.asarray(RNG.randn(1, 2, 32, 32, 3).astype(np.float32))
        v = model.init({"params": jax.random.PRNGKey(0)}, x, False)
        sd = {k: v_.numpy() for k, v_ in visual_state_dict().items()}
        params, stats = convert_visual(sd, v["params"], v["batch_stats"])
        # forward executes with the converted tree (random unscaled weights
        # overflow through 50 layers, so finiteness is not asserted here —
        # real checkpoints are trained weights)
        model.apply({"params": params, "batch_stats": stats}, x, False)
        # kernel layout: torch (O,I,D,H,W) -> flax (D,H,W,I,O)
        np.testing.assert_allclose(
            np.asarray(params["cnn"]["layer1_0"]["conv2"]["kernel"]),
            sd["cnn.layer1.0.conv2.weight"].transpose(2, 3, 4, 1, 0))
        # BN running stats actually landed in batch_stats
        got_mean = np.asarray(
            stats["cnn"]["bn1"]["BatchNorm_0"]["mean"])
        np.testing.assert_allclose(got_mean, sd["cnn.bn1.running_mean"])
        # downsample branches mapped
        assert "downsample_conv" in params["cnn"]["layer2_0"]


def resnet50_2d_state_dict(scale=0.05):
    """Synthetic torchvision-resnet50-layout 2D state dict."""
    sd = {}
    def bn(name, c):
        sd[f"{name}.weight"] = t((c,))
        sd[f"{name}.bias"] = t((c,))
        sd[f"{name}.running_mean"] = t((c,))
        sd[f"{name}.running_var"] = torch.abs(t((c,))) + 0.5
    sd["conv1.weight"] = t((64, 3, 7, 7)) * scale
    bn("bn1", 64)
    layers = [3, 4, 6, 3]
    channels = [64, 128, 256, 512]
    inplanes = 64
    for stage, (planes, blocks) in enumerate(zip(channels, layers), start=1):
        for b in range(blocks):
            pre = f"layer{stage}.{b}"
            sd[f"{pre}.conv1.weight"] = t((planes, inplanes, 1, 1)) * scale
            bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = t((planes, planes, 3, 3)) * scale
            bn(f"{pre}.bn2", planes)
            sd[f"{pre}.conv3.weight"] = t((planes * 4, planes, 1, 1)) * scale
            bn(f"{pre}.bn3", planes * 4)
            if b == 0:
                sd[f"{pre}.downsample.0.weight"] = t(
                    (planes * 4, inplanes, 1, 1)) * scale
                bn(f"{pre}.downsample.1", planes * 4)
            inplanes = planes * 4
    sd["fc.weight"] = t((1000, 2048))
    sd["fc.bias"] = t((1000,))
    return sd


class TestResNet50Inflation:
    def test_center_inflation_equals_2d_per_frame(self):
        """A 3D conv with a center-inflated kernel reads only the middle
        temporal tap, so it equals the 2D conv applied per frame — for ANY
        input (imagenet_pretraining.py:6-23 exactness property)."""
        from bmnas_tpu.utils.torch_convert import (
            conv2d_kernel, conv3d_kernel, inflate_2d_to_3d)
        import flax.linen as nn

        w2d = RNG.randn(8, 4, 3, 3).astype(np.float32) * 0.2
        x = RNG.randn(2, 5, 6, 6, 4).astype(np.float32)  # (B,T,H,W,C)

        conv3 = nn.Conv(8, (3, 3, 3), padding=1, use_bias=False)
        k3 = conv3d_kernel(inflate_2d_to_3d(w2d, 3))
        out3 = conv3.apply({"params": {"kernel": jnp.asarray(k3)}},
                           jnp.asarray(x))

        conv2 = nn.Conv(8, (3, 3), padding=1, use_bias=False)
        k2 = conv2d_kernel(w2d)
        out2 = conv2.apply({"params": {"kernel": jnp.asarray(k2)}},
                           jnp.asarray(x.reshape(10, 6, 6, 4)))
        np.testing.assert_allclose(
            np.asarray(out3).reshape(10, 6, 6, 8), np.asarray(out2),
            rtol=2e-5, atol=2e-5)

    def test_converted_visual_is_temporally_exact(self, tmp_path):
        """Full Visual built from a torchvision-layout 2D state dict: on a
        temporally-constant clip every stage output must be constant along T
        (center inflation => zero temporal mixing => per-frame 2D parity)."""
        from bmnas_tpu.models.ntu import Visual
        from bmnas_tpu.utils.torch_convert import convert_resnet50_inflated

        model = Visual(num_outputs=60)
        frame = RNG.randn(1, 1, 32, 32, 3).astype(np.float32)
        clip = jnp.asarray(np.repeat(frame, 4, axis=1))  # (1, T=4, 32, 32, 3)
        v = model.init({"params": jax.random.PRNGKey(0)}, clip, False)
        sd = {k: v_.numpy() for k, v_ in resnet50_2d_state_dict().items()}
        params, stats = convert_resnet50_inflated(sd, v["params"],
                                                  v["batch_stats"])
        # BN stats transferred; classifier untouched (fc dropped)
        np.testing.assert_allclose(
            np.asarray(stats["cnn"]["bn1"]["BatchNorm_0"]["mean"]),
            sd["bn1.running_mean"])
        np.testing.assert_allclose(np.asarray(params["classifier"]["kernel"]),
                                   np.asarray(v["params"]["classifier"]["kernel"]))
        outs = model.apply({"params": params, "batch_stats": stats}, clip,
                           False)
        for fm in outs[:4]:
            fm = np.asarray(fm)
            assert np.isfinite(fm).all()
            for tt in range(1, fm.shape[1]):
                np.testing.assert_allclose(fm[:, tt], fm[:, 0],
                                           rtol=1e-5, atol=1e-5)
        # and the features are non-degenerate
        assert np.abs(np.asarray(outs[3])).max() > 0


class TestLoadNTUBackbones:
    def test_bn_running_stats_reach_state(self, tmp_path):
        """Both params AND batch_stats must be imported: the reference loads
        the full state_dict incl. running_mean/var (ntu_darts_searchable.py:
        32-36). Dropping stats silently breaks eval-mode pretrained parity."""
        from bmnas_tpu.models.hcn import HCN
        from bmnas_tpu.models.ntu import Visual
        from bmnas_tpu.utils.torch_convert import load_ntu_backbones

        rgb = Visual(num_outputs=60)
        x = jnp.asarray(RNG.randn(1, 2, 32, 32, 3).astype(np.float32))
        rgb_v = rgb.init({"params": jax.random.PRNGKey(0)}, x, False)
        ske = HCN(num_outputs=60, drpt=0.1)
        s = jnp.asarray(RNG.randn(1, 32, 25, 2, 3).astype(np.float32))
        ske_v = ske.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, s, False)

        ske_path = str(tmp_path / "ske.checkpoint")
        rgb_path = str(tmp_path / "rgb.checkpoint")
        # tame the random weights so 50 layers of eval-mode forward stay
        # finite (trained checkpoints are well-scaled; raw randn overflows)
        rgb_sd = {k: v_ * 0.05 if v_.dim() == 5 or "conv1.weight" in k else v_
                  for k, v_ in visual_state_dict().items()}
        torch.save(hcn_state_dict(), ske_path)
        torch.save(rgb_sd, rgb_path)

        task_params = {"skenet": ske_v["params"], "rgbnet": rgb_v["params"]}
        task_stats = {"rgbnet": rgb_v["batch_stats"]}
        params, stats = load_ntu_backbones(task_params, task_stats,
                                           ske_path, rgb_path)

        sd = {k: v_.numpy() for k, v_ in rgb_sd.items()}
        np.testing.assert_allclose(
            np.asarray(stats["rgbnet"]["cnn"]["bn1"]["BatchNorm_0"]["mean"]),
            sd["cnn.bn1.running_mean"])
        np.testing.assert_allclose(
            np.asarray(stats["rgbnet"]["cnn"]["layer3_2"]["bn2"]
                       ["BatchNorm_0"]["var"]),
            sd["cnn.layer3.2.bn2.running_var"])

        # eval-mode forward with imported stats differs from the
        # stats-dropped (init running stats) forward
        out_with = rgb.apply({"params": params["rgbnet"],
                              "batch_stats": stats["rgbnet"]}, x, False)
        out_without = rgb.apply({"params": params["rgbnet"],
                                 "batch_stats": rgb_v["batch_stats"]}, x, False)
        assert not np.allclose(np.asarray(out_with[4]),
                               np.asarray(out_without[4]), equal_nan=True)
