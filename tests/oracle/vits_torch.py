"""Independent torch reference implementation of VITS inference.

Plays the role the reference's CPUBackend plays for its Metal path
(SURVEY.md §4): an independently-written oracle the JAX implementation is
validated against, module by module and end-to-end. Uses torch.nn.functional
primitives (independent conv/norm/softmax implementations) and follows the
published VITS model semantics. CPU only, float32/float64.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import torch
import torch.nn.functional as F


class P:
    """Flat-dict parameter accessor mirroring piper_tpu's Prefix."""

    def __init__(self, params: Dict[str, np.ndarray], prefix: str = "", dtype=torch.float32):
        self.params = params
        self.prefix = prefix
        self.dtype = dtype

    def __getitem__(self, key: str) -> torch.Tensor:
        full = f"{self.prefix}.{key}" if self.prefix else key
        return torch.from_numpy(np.asarray(self.params[full])).to(self.dtype)

    def __contains__(self, key: str) -> bool:
        full = f"{self.prefix}.{key}" if self.prefix else key
        return full in self.params

    def sub(self, key: str) -> "P":
        full = f"{self.prefix}.{key}" if self.prefix else key
        return P(self.params, full, self.dtype)


def layer_norm(x: torch.Tensor, p: P, eps: float = 1e-5) -> torch.Tensor:
    # (B, C, T): normalize channels.
    y = x.transpose(1, -1)
    y = F.layer_norm(y, (y.shape[-1],), p["gamma"], p["beta"], eps)
    return y.transpose(1, -1)


def sequence_mask(lengths: torch.Tensor, max_len: int) -> torch.Tensor:
    pos = torch.arange(max_len, dtype=lengths.dtype)
    return (pos.unsqueeze(0) < lengths.unsqueeze(1)).unsqueeze(1).float()


# --- relative attention ---


def _get_rel_emb(emb: torch.Tensor, length: int, window: int) -> torch.Tensor:
    pad_l = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad_l > 0:
        emb = F.pad(emb, (0, 0, pad_l, pad_l))
    return emb[:, start : start + 2 * length - 1]


def _rel_to_abs(x: torch.Tensor) -> torch.Tensor:
    b, h, l, _ = x.shape
    x = F.pad(x, (0, 1))
    x = x.view(b, h, l * 2 * l)
    x = F.pad(x, (0, l - 1))
    x = x.view(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x: torch.Tensor) -> torch.Tensor:
    b, h, l, _ = x.shape
    x = F.pad(x, (0, l - 1))
    x = x.view(b, h, l * (2 * l - 1))
    x = F.pad(x, (l, 0))
    x = x.view(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def attention(x: torch.Tensor, attn_mask: torch.Tensor, p: P, n_heads: int, window: int):
    b, c, t = x.shape
    q = F.conv1d(x, p["conv_q.weight"], p["conv_q.bias"])
    k = F.conv1d(x, p["conv_k.weight"], p["conv_k.bias"])
    v = F.conv1d(x, p["conv_v.weight"], p["conv_v.bias"])
    kc = c // n_heads

    def split(y):
        return y.view(b, n_heads, kc, t).transpose(2, 3)  # (B,H,T,D)

    qh, kh, vh = split(q), split(k), split(v)
    scores = torch.matmul(qh / math.sqrt(kc), kh.transpose(-2, -1))
    rel_k = _get_rel_emb(p["emb_rel_k"], t, window)
    rel_logits = torch.matmul(qh / math.sqrt(kc), rel_k.unsqueeze(0).transpose(-2, -1))
    scores = scores + _rel_to_abs(rel_logits)
    scores = scores.masked_fill(attn_mask == 0, -1e4)
    w = F.softmax(scores, dim=-1)
    out = torch.matmul(w, vh)
    rel_v = _get_rel_emb(p["emb_rel_v"], t, window)
    out = out + torch.matmul(_abs_to_rel(w), rel_v.unsqueeze(0))
    out = out.transpose(2, 3).contiguous().view(b, c, t)
    return F.conv1d(out, p["conv_o.weight"], p["conv_o.bias"])


def ffn(x: torch.Tensor, x_mask: torch.Tensor, p: P, kernel: int) -> torch.Tensor:
    pad = (kernel - 1) // 2
    h = F.conv1d(x * x_mask, p["conv_1.weight"], p["conv_1.bias"], padding=pad)
    h = torch.relu(h)
    h = F.conv1d(h * x_mask, p["conv_2.weight"], p["conv_2.bias"], padding=pad)
    return h * x_mask


def encoder(x: torch.Tensor, x_mask: torch.Tensor, p: P, hp) -> torch.Tensor:
    attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
    x = x * x_mask
    for i in range(hp.n_layers):
        y = attention(x, attn_mask, p.sub(f"attn_layers.{i}"), hp.n_heads, hp.window_size)
        x = layer_norm(x + y, p.sub(f"norm_layers_1.{i}"))
        y = ffn(x, x_mask, p.sub(f"ffn_layers.{i}"), hp.kernel_size)
        x = layer_norm(x + y, p.sub(f"norm_layers_2.{i}"))
    return x * x_mask


def text_encoder(ids: torch.Tensor, lengths: torch.Tensor, params, hp):
    p = P(params, "enc_p")
    emb = p["emb.weight"]
    x = emb[ids] * math.sqrt(hp.hidden_channels)
    x = x.transpose(1, 2)
    x_mask = sequence_mask(lengths, ids.shape[1])
    x = encoder(x, x_mask, p.sub("encoder"), hp)
    stats = F.conv1d(x, p["proj.weight"], p["proj.bias"]) * x_mask
    m, logs = stats.split(hp.inter_channels, dim=1)
    return x, m, logs, x_mask


# --- stochastic duration predictor ---


def dds_conv(x, x_mask, p: P, kernel: int, g=None):
    if g is not None:
        x = x + g
    ch = x.shape[1]
    for i in range(3):
        d = kernel**i
        pad = (kernel - 1) // 2 * d
        y = F.conv1d(x * x_mask, p[f"convs_sep.{i}.weight"], p[f"convs_sep.{i}.bias"],
                     padding=pad, dilation=d, groups=ch)
        y = layer_norm(y, p.sub(f"norms_1.{i}"))
        y = F.gelu(y)
        y = F.conv1d(y, p[f"convs_1x1.{i}.weight"], p[f"convs_1x1.{i}.bias"])
        y = layer_norm(y, p.sub(f"norms_2.{i}"))
        y = F.gelu(y)
        x = x + y
    return x * x_mask


def rq_spline_inverse(x, uw, uh, ud, tail_bound=5.0):
    """Inverse rational-quadratic spline with linear tails (elementwise)."""
    min_bw = min_bh = min_d = 1e-3
    nb = uw.shape[-1]
    inside = (x >= -tail_bound) & (x <= tail_bound)
    const = math.log(math.expm1(1 - min_d))
    ud = F.pad(ud, (1, 1), value=const)

    widths = F.softmax(uw, dim=-1)
    widths = min_bw + (1 - min_bw * nb) * widths
    cw = torch.cumsum(widths, -1)
    cw = F.pad(cw, (1, 0))
    cw = 2 * tail_bound * cw - tail_bound
    cw[..., 0] = -tail_bound
    cw[..., -1] = tail_bound
    widths = cw[..., 1:] - cw[..., :-1]

    derivs = min_d + F.softplus(ud)

    heights = F.softmax(uh, dim=-1)
    heights = min_bh + (1 - min_bh * nb) * heights
    ch_ = torch.cumsum(heights, -1)
    ch_ = F.pad(ch_, (1, 0))
    ch_ = 2 * tail_bound * ch_ - tail_bound
    ch_[..., 0] = -tail_bound
    ch_[..., -1] = tail_bound
    heights = ch_[..., 1:] - ch_[..., :-1]

    xc = x.clamp(-tail_bound, tail_bound)
    idx = (xc.unsqueeze(-1) >= ch_[..., :-1]).sum(-1) - 1
    idx = idx.clamp(0, nb - 1).unsqueeze(-1)

    def g(a):
        return a.gather(-1, idx).squeeze(-1)

    in_cw, in_w = g(cw), g(widths)
    in_ch, in_h = g(ch_), g(heights)
    in_d = g(derivs[..., :-1])
    in_d1 = derivs.gather(-1, idx + 1).squeeze(-1)
    delta = in_h / in_w

    term = (xc - in_ch) * (in_d + in_d1 - 2 * delta)
    a = term + in_h * (delta - in_d)
    b = in_h * in_d - term
    c = -delta * (xc - in_ch)
    disc = (b * b - 4 * a * c).clamp_min(0)
    root = 2 * c / (-b - torch.sqrt(disc))
    out = root * in_w + in_cw
    return torch.where(inside, out, x)


def conv_flow_reverse(x, x_mask, p: P, hp, g):
    half = x.shape[1] // 2
    x0, x1 = x[:, :half], x[:, half:]
    h = F.conv1d(x0, p["pre.weight"], p["pre.bias"])
    h = dds_conv(h, x_mask, p.sub("convs"), hp.dp_kernel_size, g=g)
    h = F.conv1d(h, p["proj.weight"], p["proj.bias"]) * x_mask
    b, _, t = x0.shape
    nb = hp.dp_num_bins
    h = h.reshape(b, half, 3 * nb - 1, t).permute(0, 1, 3, 2)
    denom = math.sqrt(hp.dp_filter_channels)
    x1 = rq_spline_inverse(
        x1, h[..., :nb] / denom, h[..., nb : 2 * nb] / denom, h[..., 2 * nb :],
        tail_bound=hp.dp_tail_bound,
    )
    return torch.cat([x0, x1], 1) * x_mask


def sdp_reverse(x, x_mask, noise, params, hp, g=None, noise_scale=0.8):
    p = P(params, "dp")
    h = F.conv1d(x, p["pre.weight"], p["pre.bias"])
    if g is not None:
        h = h + F.conv1d(g, p["cond.weight"], p["cond.bias"])
    h = dds_conv(h, x_mask, p.sub("convs"), hp.dp_kernel_size)
    h = F.conv1d(h, p["proj.weight"], p["proj.bias"]) * x_mask

    z = noise * noise_scale
    idxs = [2 * i + 1 for i in range(hp.dp_n_flows)]
    for idx in reversed(idxs[1:]):
        z = torch.flip(z, [1])
        z = conv_flow_reverse(z, x_mask, p.sub(f"flows.{idx}"), hp, g=h)
    z = torch.flip(z, [1])
    ea = p.sub("flows.0")
    z = (z - ea["m"].unsqueeze(0)) * torch.exp(-ea["logs"].unsqueeze(0)) * x_mask
    return z[:, :1]


# --- flow decoder ---


def wavenet(x, x_mask, p: P, hidden, n_layers, dilation_rate, g=None):
    out = torch.zeros_like(x)
    g_all = F.conv1d(g, p["cond_layer.weight"], p["cond_layer.bias"]) if g is not None else None
    for i in range(n_layers):
        d = dilation_rate**i
        k = p[f"in_layers.{i}.weight"].shape[-1]
        pad = (k - 1) // 2 * d
        x_in = F.conv1d(x, p[f"in_layers.{i}.weight"], p[f"in_layers.{i}.bias"],
                        padding=pad, dilation=d)
        if g_all is not None:
            x_in = x_in + g_all[:, i * 2 * hidden : (i + 1) * 2 * hidden]
        acts = torch.tanh(x_in[:, :hidden]) * torch.sigmoid(x_in[:, hidden:])
        rs = F.conv1d(acts, p[f"res_skip_layers.{i}.weight"], p[f"res_skip_layers.{i}.bias"])
        if i < n_layers - 1:
            x = (x + rs[:, :hidden]) * x_mask
            out = out + rs[:, hidden:]
        else:
            out = out + rs
    return out * x_mask


def flow_reverse(z, y_mask, params, hp, g=None):
    p = P(params, "flow")
    for i in reversed(range(hp.flow_n_flows)):
        z = torch.flip(z, [1])
        rc = p.sub(f"flows.{2 * i}")
        half = z.shape[1] // 2
        z0, z1 = z[:, :half], z[:, half:]
        h = F.conv1d(z0, rc["pre.weight"], rc["pre.bias"]) * y_mask
        h = wavenet(h, y_mask, rc.sub("enc"), hp.flow_hidden_channels,
                    hp.flow_n_layers, hp.flow_dilation_rate, g=g)
        m = F.conv1d(h, rc["post.weight"], rc["post.bias"]) * y_mask
        z1 = (z1 - m) * y_mask
        z = torch.cat([z0, z1], 1)
    return z


# --- HiFi-GAN ---


def hifigan(z, params, hp, g=None, y_mask=None):
    """HiFi-GAN generator. `y_mask` (B, 1, T_frames) gives exact-length
    semantics on padded buckets: activations are zeroed before every conv so
    the region beyond y_len behaves like the end of the array (matching
    piper_tpu's hifigan_generator t_mask)."""

    def mk(x, m):
        return x if m is None else x * m

    p = P(params, "dec")
    use_rb2 = "dec.resblocks.0.convs.0.weight" in params
    m = y_mask
    x = F.conv1d(mk(z, m), p["conv_pre.weight"], p["conv_pre.bias"], padding=3)
    if g is not None:
        x = x + F.conv1d(g, p["cond.weight"], p["cond.bias"])
    nk = hp.num_resblock_kernels
    for i in range(hp.num_upsamples):
        x = F.leaky_relu(mk(x, m), 0.1)
        k, u = hp.upsample_kernel_sizes[i], hp.upsample_rates[i]
        x = F.conv_transpose1d(mk(x, m), p[f"ups.{i}.weight"], p[f"ups.{i}.bias"],
                               stride=u, padding=(k - u) // 2)
        if m is not None:
            m = torch.repeat_interleave(m, u, dim=2)
            x = x * m
        acc = None
        for j in range(nk):
            rb = p.sub(f"resblocks.{i * nk + j}")
            kj = hp.resblock_kernel_sizes[j]
            y = x
            for mi, d in enumerate(hp.resblock_dilation_sizes[j]):
                if use_rb2:
                    yt = F.leaky_relu(y, 0.1)
                    yt = F.conv1d(mk(yt, m), rb[f"convs.{mi}.weight"], rb[f"convs.{mi}.bias"],
                                  padding=(kj - 1) // 2 * d, dilation=d)
                else:
                    yt = F.leaky_relu(y, 0.1)
                    yt = F.conv1d(mk(yt, m), rb[f"convs1.{mi}.weight"], rb[f"convs1.{mi}.bias"],
                                  padding=(kj - 1) // 2 * d, dilation=d)
                    yt = F.leaky_relu(yt, 0.1)
                    yt = F.conv1d(mk(yt, m), rb[f"convs2.{mi}.weight"], rb[f"convs2.{mi}.bias"],
                                  padding=(kj - 1) // 2)
                y = y + yt
            acc = y if acc is None else acc + y
        x = acc / nk
    x = F.leaky_relu(mk(x, m))
    x = F.conv1d(mk(x, m), p["conv_post.weight"], p["conv_post.bias"], padding=3)
    out = torch.tanh(x)
    return out if m is None else out * m


# --- full inference ---


def generate_path(w_ceil: torch.Tensor, x_mask: torch.Tensor, y_mask: torch.Tensor):
    """(B, P) durations -> (B, T, P) path, torch cumsum/pad formulation."""
    b, _, t_x = x_mask.shape
    t_y = y_mask.shape[-1]
    cum = torch.cumsum(w_ceil, -1)  # (B, P)
    pos = torch.arange(t_y).view(1, t_y, 1)
    path = (pos < cum.unsqueeze(1)).float()
    path_prev = F.pad(path, (1, 0))[:, :, :-1]
    path = path - path_prev
    return path * y_mask.transpose(1, 2) * x_mask


def infer(params, hp, ids, lengths, dp_noise, main_noise, *, max_frames,
          noise_scale=0.667, length_scale=1.0, noise_w=0.8, sid=None):
    ids = torch.as_tensor(ids, dtype=torch.long)
    lengths = torch.as_tensor(lengths, dtype=torch.long)
    dp_noise = torch.as_tensor(np.asarray(dp_noise), dtype=torch.float32)
    main_noise = torch.as_tensor(np.asarray(main_noise), dtype=torch.float32)

    x, m_p, logs_p, x_mask = text_encoder(ids, lengths, params, hp)
    g = None
    if hp.n_speakers > 1 and "emb_g.weight" in params:
        emb_g = torch.from_numpy(np.asarray(params["emb_g.weight"])).float()
        g = emb_g[torch.as_tensor(sid, dtype=torch.long)].unsqueeze(-1)
    logw = sdp_reverse(x, x_mask, dp_noise, params, hp, g=g, noise_scale=noise_w)
    w = torch.exp(logw) * x_mask * length_scale
    w_ceil = torch.ceil(w)[:, 0]
    y_lengths = torch.clamp(w_ceil.sum(-1), min=1, max=max_frames)
    y_mask = sequence_mask(y_lengths, max_frames)
    path = generate_path(w_ceil, x_mask, y_mask)
    m_p = torch.einsum("btp,bcp->bct", path, m_p)
    logs_p = torch.einsum("btp,bcp->bct", path, logs_p)
    z_p = m_p + main_noise * torch.exp(logs_p) * noise_scale
    z = flow_reverse(z_p, y_mask, params, hp, g=g)
    audio = hifigan(z * y_mask, params, hp, g=g, y_mask=y_mask)
    return audio[:, 0, :].numpy(), y_lengths.numpy()
