"""HCN skeleton backbone (NTU).

Rebuild of ``models/central/ntu.py:43-173`` (hierarchical co-occurrence
network, arXiv:1804.06055): per-person position and motion conv streams
(motion = frame diff bilinearly re-interpolated to T), point-level convs,
permute to joint-axis, global-level convs, person merge by elementwise max.
Conv weights are shared across the two persons (same modules applied per
person, like the reference).

Layout: skeleton input is (N, T, V, M, C=3) channels-last (reference:
(N, C, T, V, M), central/ntu.py:120). The reference's channel/joint permute
``(0,3,2,1)`` becomes a swap of the last two axes here. The fc7 flatten order
differs (channel-major vs L-major) — absorbed by the fc7 kernel; the torch
checkpoint converter permutes accordingly.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ChannelDropout(nn.Module):
    """torch nn.Dropout2d: drops whole channels of an (N, H, W, C) map."""
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.Dropout(self.rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)


class HCN(nn.Module):
    """Returns (new_hidden, logits); new_hidden = [m1..m6, out7, out8]
    (central/ntu.py:162-173)."""
    num_outputs: int
    drpt: float
    in_channel: int = 3
    num_joint: int = 25
    num_person: int = 2
    out_channel: int = 64
    window_size: int = 32

    def setup(self):
        oc, ws = self.out_channel, self.window_size
        # Reference init: Xavier-uniform kernels, zero biases for every
        # conv/linear (models/utils.py:8-27 weights_init via
        # initial_model_weight, applied at central/ntu.py:117).
        ki = nn.initializers.xavier_uniform()
        bi = nn.initializers.zeros
        conv = lambda f, k, pad, name: nn.Conv(
            f, k, padding=pad, kernel_init=ki, bias_init=bi, name=name)
        # position stream
        self.conv1 = conv(oc, (1, 1), 0, "conv1")
        self.conv2 = conv(ws, (3, 1), ((1, 1), (0, 0)), "conv2")
        self.conv3 = conv(oc // 2, (3, 3), 1, "conv3")
        self.conv4 = conv(oc, (3, 3), 1, "conv4")
        # motion stream
        self.conv1m = conv(oc, (1, 1), 0, "conv1m")
        self.conv2m = conv(ws, (3, 1), ((1, 1), (0, 0)), "conv2m")
        self.conv3m = conv(oc // 2, (3, 3), 1, "conv3m")
        self.conv4m = conv(oc, (3, 3), 1, "conv4m")
        # merged
        self.conv5 = conv(oc * 2, (3, 3), 1, "conv5")
        self.conv6 = conv(oc * 4, (3, 3), 1, "conv6")
        self.fc7 = nn.Dense(256 * 2, kernel_init=ki, bias_init=bi, name="fc7")
        self.fc8 = nn.Dense(self.num_outputs, kernel_init=ki, bias_init=bi,
                            name="fc8")
        self.drop_p = _ChannelDropout(self.drpt)
        self.drop_m = _ChannelDropout(self.drpt)
        self.drop5 = _ChannelDropout(self.drpt)
        self.drop6 = _ChannelDropout(self.drpt)
        self.drop7 = nn.Dropout(self.drpt)

    def __call__(self, x: jnp.ndarray, train: bool):
        N, T, V, M, C = x.shape

        # motion = frame diff, bilinear re-interp T-1 -> T over the T axis
        # (central/ntu.py:121-125; V-axis resize is identity at same size).
        motion = x[:, 1:] - x[:, :-1]                   # (N, T-1, V, M, C)
        motion = jax.image.resize(motion, (N, T, V, M, C), method="linear")

        hidden = []
        logits = []
        for i in range(self.num_person):
            pos = x[:, :, :, i, :]
            mot = motion[:, :, :, i, :]

            # position stream: point-level then joint-as-channel level
            out1 = nn.relu(self.conv1(pos))
            out2 = self.conv2(out1)
            h = jnp.swapaxes(out2, 2, 3)                # joints -> channels
            out3 = nn.max_pool(self.conv3(h), (2, 2), strides=(2, 2))
            h = self.conv4(out3)
            h = self.drop_p(h, train)
            out_p = nn.max_pool(h, (2, 2), strides=(2, 2))

            # motion stream
            m1 = nn.relu(self.conv1m(mot))
            m2 = self.conv2m(m1)
            h = jnp.swapaxes(m2, 2, 3)
            m3 = nn.max_pool(self.conv3m(h), (2, 2), strides=(2, 2))
            h = self.conv4m(m3)
            h = self.drop_m(h, train)
            out_m = nn.max_pool(h, (2, 2), strides=(2, 2))

            out4 = jnp.concatenate([out_p, out_m], axis=-1)
            # conv5 (window 32 branch: with maxpool, central/ntu.py:94-101)
            h = nn.relu(self.conv5(out4))
            h = self.drop5(h, train)
            out5 = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.relu(self.conv6(out5))
            h = self.drop6(h, train)
            out6 = nn.max_pool(h, (2, 2), strides=(2, 2))

            hidden.append([out1, out2, out3, out4, out5, out6])
            logits.append(out6)

        # person merge: elementwise max (central/ntu.py:157).
        out7 = jnp.maximum(logits[0], logits[1])
        out7 = out7.reshape(out7.shape[0], -1)
        h8 = nn.relu(self.fc7(out7))
        out8 = self.drop7(h8, deterministic=not train)
        outf = self.fc8(out8)

        new_hidden = [jnp.maximum(a, b) for a, b in zip(hidden[0], hidden[1])]
        new_hidden.append(out7)
        new_hidden.append(out8)
        return new_hidden, outf
