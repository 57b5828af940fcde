"""Full-model numerical parity: torch oracle models (reference math,
independent implementation) -> state_dict -> importer -> JAX forward.

This is the strongest parity evidence short of the released checkpoints:
if these pass, the importer + model reproduce the reference computation
end-to-end (fp32) to ~1e-4.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from maa3_tpu.models.dit import DiTConfig, dit_apply
from maa3_tpu.models.vae1d import VAEConfig, vae_encode_moments, vae_decode
from maa3_tpu.torch_import import dit_from_torch, vae_from_torch, fold_weight_norm


# ---------------------------------------------------------------------------
# torch oracle: Lumina Next-DiT semantics (flag_large_dit.py), small config
# ---------------------------------------------------------------------------

class _RMSNorm(nn.Module):
    def __init__(self, d, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(d))

    def forward(self, x):
        out = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + self.eps)
        return out * self.weight


def _modulate(x, shift, scale):
    return x * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class _Attention(nn.Module):
    def __init__(self, dim, n_heads, y_dim):
        super().__init__()
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.wq = nn.Linear(dim, dim, bias=False)
        self.wk = nn.Linear(dim, dim, bias=False)
        self.wv = nn.Linear(dim, dim, bias=False)
        self.wk_y = nn.Linear(y_dim, dim, bias=False)
        self.wv_y = nn.Linear(y_dim, dim, bias=False)
        self.gate = nn.Parameter(torch.randn(n_heads))
        self.wo = nn.Linear(dim, dim, bias=False)

    def forward(self, x, freqs_cis, y):
        b, l, d = x.shape
        q = self.wq(x).view(b, l, self.n_heads, self.head_dim)
        k = self.wk(x).view(b, l, self.n_heads, self.head_dim)
        v = self.wv(x).view(b, l, self.n_heads, self.head_dim)
        qc = torch.view_as_complex(q.float().reshape(*q.shape[:-1], -1, 2))
        kc = torch.view_as_complex(k.float().reshape(*k.shape[:-1], -1, 2))
        fc = freqs_cis[:l].view(1, l, 1, self.head_dim // 2)
        q = torch.view_as_real(qc * fc).flatten(3)
        k = torch.view_as_real(kc * fc).flatten(3)
        out = F.scaled_dot_product_attention(
            q.permute(0, 2, 1, 3), k.permute(0, 2, 1, 3),
            v.permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
        yk = self.wk_y(y).view(b, -1, self.n_heads, self.head_dim)
        yv = self.wv_y(y).view(b, -1, self.n_heads, self.head_dim)
        out_y = F.scaled_dot_product_attention(
            q.permute(0, 2, 1, 3), yk.permute(0, 2, 1, 3),
            yv.permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
        out = out + out_y * self.gate.tanh().view(1, 1, -1, 1)
        return self.wo(out.flatten(-2))


class _FeedForward(nn.Module):
    def __init__(self, dim, multiple_of=32):
        super().__init__()
        h = int(2 * (4 * dim) / 3)
        h = multiple_of * ((h + multiple_of - 1) // multiple_of)
        self.w1 = nn.Linear(dim, h, bias=False)
        self.w2 = nn.Linear(h, dim, bias=False)
        self.w3 = nn.Linear(dim, h, bias=False)

    def forward(self, x):
        return self.w2(F.silu(self.w1(x)) * self.w3(x))


class _Block(nn.Module):
    def __init__(self, dim, n_heads, y_dim):
        super().__init__()
        self.attention = _Attention(dim, n_heads, y_dim)
        self.feed_forward = _FeedForward(dim)
        self.attention_norm = _RMSNorm(dim)
        self.ffn_norm = _RMSNorm(dim)
        self.attention_y_norm = _RMSNorm(y_dim)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(dim, 6 * dim))

    def forward(self, x, y, freqs_cis, adaln):
        sm, scm, gm, sp, scp, gp = self.adaLN_modulation(adaln).chunk(6, dim=1)
        h = x + gm.unsqueeze(1) * self.attention(
            _modulate(self.attention_norm(x), sm, scm), freqs_cis,
            self.attention_y_norm(y))
        return h + gp.unsqueeze(1) * self.feed_forward(
            _modulate(self.ffn_norm(h), sp, scp))


class _TorchDiT(nn.Module):
    def __init__(self, in_ch, ctx_dim, dim, depth, n_heads, max_len=64):
        super().__init__()
        self.t_embedder_mlp = nn.Sequential(
            nn.Linear(256, dim), nn.SiLU(), nn.Linear(dim, dim))
        self.proj_in = nn.Linear(in_ch, dim)
        self.blocks = nn.ModuleList(
            [_Block(dim, n_heads, ctx_dim) for _ in range(depth)])
        self.final_norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.final_linear = nn.Linear(dim, in_ch)
        self.final_adaLN = nn.Sequential(nn.SiLU(), nn.Linear(dim, 2 * dim))
        self.cap_embedder = nn.Sequential(nn.LayerNorm(ctx_dim),
                                          nn.Linear(ctx_dim, dim))
        head_dim = dim // n_heads
        freqs = 1.0 / (10000.0 ** (torch.arange(0, head_dim, 2)[: head_dim // 2]
                                   .float() / head_dim))
        t = torch.arange(max_len).float()
        self.freqs_cis = torch.polar(torch.ones(max_len, head_dim // 2),
                                     torch.outer(t, freqs))

    def t_embed(self, t, dim=256):
        half = dim // 2
        freqs = torch.exp(-math.log(10000) * torch.arange(half).float() / half)
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, ctx):
        x = x.permute(0, 2, 1)
        x = self.proj_in(x)
        temb = self.t_embedder_mlp(self.t_embed(t))
        cap = self.cap_embedder(ctx.mean(dim=1))
        adaln = temb + cap
        for blk in self.blocks:
            x = blk(x, ctx, self.freqs_cis, adaln)
        shift, scale = self.final_adaLN(adaln).chunk(2, dim=1)
        x = _modulate(self.final_norm(x), shift, scale)
        x = self.final_linear(x)
        return x.permute(0, 2, 1)

    def export_state_dict(self):
        """Rename to the reference checkpoint naming for the importer."""
        sd = {}
        own = self.state_dict()
        ren = {
            "t_embedder_mlp.0.": "t_embedder.mlp.0.",
            "t_embedder_mlp.2.": "t_embedder.mlp.2.",
            "final_linear.": "final_layer.linear.",
            "final_adaLN.1.": "final_layer.adaLN_modulation.1.",
            "cap_embedder.0.": "cap_embedder.0.",
            "cap_embedder.1.": "cap_embedder.1.",
        }
        for k, v in own.items():
            if k == "freqs_cis":
                continue
            nk = k
            for a, b in ren.items():
                if k.startswith(a):
                    nk = b + k[len(a):]
            sd[nk] = v.numpy()
        return sd


def test_dit_full_parity_vs_torch_oracle():
    torch.manual_seed(0)
    in_ch, ctx_dim, dim, depth, heads = 4, 24, 64, 2, 4
    model = _TorchDiT(in_ch, ctx_dim, dim, depth, heads).eval()
    # nonzero adaLN / final so the whole path is exercised
    sd = model.export_state_dict()

    cfg = DiTConfig(in_channels=in_ch, context_dim=ctx_dim, hidden_size=dim,
                    depth=depth, num_heads=heads, max_len=64, multiple_of=32)
    params = dit_from_torch(sd, depth=depth)

    rng = np.random.RandomState(0)
    x = rng.randn(2, in_ch, 16).astype(np.float32)
    t = np.array([41, 977], np.int64)
    ctx = rng.randn(2, 6, ctx_dim).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
    ours = dit_apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                     jnp.asarray(ctx), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# torch oracle: 1-D VAE (autoencoder1d.py semantics), small config
# ---------------------------------------------------------------------------

def _gn(c):
    return nn.GroupNorm(32, c, eps=1e-6)


class _Res(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv1d(cin, cout, k, padding=k // 2)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv1d(cout, cout, k, padding=k // 2)
        if cin != cout:
            self.nin_shortcut = nn.Conv1d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class _Attn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _gn(c)
        self.q = nn.Conv1d(c, c, 1)
        self.k = nn.Conv1d(c, c, 1)
        self.v = nn.Conv1d(c, c, 1)
        self.proj_out = nn.Conv1d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, t = q.shape
        w = torch.bmm(q.permute(0, 2, 1), k) * (c ** -0.5)
        w = F.softmax(w, dim=2)
        h = torch.bmm(v, w.permute(0, 2, 1))
        return x + self.proj_out(h)


class _TorchVAE(nn.Module):
    """Encoder+decoder mirroring autoencoder1d.py with ch_mult (1,2),
    down at level 0, kernel 5 (encoder) / 3 (decoder blocks)."""

    def __init__(self, in_ch=80, ch=32, zc=4, k=5):
        super().__init__()
        # encoder
        self.enc_conv_in = nn.Conv1d(in_ch, ch, k, padding=k // 2)
        self.e_b00 = _Res(ch, ch, k)
        self.e_down0 = nn.Conv1d(ch, ch, 3, stride=2)
        self.e_b10 = _Res(ch, 2 * ch, k)
        self.e_mid1 = _Res(2 * ch, 2 * ch, k)
        self.e_mida = _Attn(2 * ch)
        self.e_mid2 = _Res(2 * ch, 2 * ch, k)
        self.e_norm_out = _gn(2 * ch)
        self.e_conv_out = nn.Conv1d(2 * ch, 2 * zc, k, padding=k // 2)
        self.quant_conv = nn.Conv1d(2 * zc, 2 * zc, 1)
        # decoder
        self.post_quant_conv = nn.Conv1d(zc, zc, 1)
        self.d_conv_in = nn.Conv1d(zc, 2 * ch, k, padding=k // 2)
        self.d_mid1 = _Res(2 * ch, 2 * ch, 3)
        self.d_mida = _Attn(2 * ch)
        self.d_mid2 = _Res(2 * ch, 2 * ch, 3)
        self.d_b10 = _Res(2 * ch, 2 * ch, 3)
        self.d_b11 = _Res(2 * ch, 2 * ch, 3)
        self.d_up1 = nn.Conv1d(2 * ch, 2 * ch, 3, padding=1)
        self.d_b00 = _Res(2 * ch, ch, 3)
        self.d_b01 = _Res(ch, ch, 3)
        self.d_norm_out = _gn(ch)
        self.d_conv_out = nn.Conv1d(ch, in_ch, k, padding=k // 2)

    def encode(self, x):
        h = self.enc_conv_in(x)
        h = self.e_b00(h)
        h = self.e_down0(F.pad(h, (0, 1)))
        h = self.e_b10(h)
        h = self.e_mid2(self.e_mida(self.e_mid1(h)))
        h = self.e_conv_out(F.silu(self.e_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.d_conv_in(self.post_quant_conv(z))
        h = self.d_mid2(self.d_mida(self.d_mid1(h)))
        h = self.d_b11(self.d_b10(h))
        h = self.d_up1(F.interpolate(h, scale_factor=2.0, mode="nearest"))
        h = self.d_b01(self.d_b00(h))
        return self.d_conv_out(F.silu(self.d_norm_out(h)))

    def export_state_dict(self):
        ren = {
            "enc_conv_in.": "encoder.conv_in.",
            "e_b00.": "encoder.down.0.block.0.",
            "e_down0.": "encoder.down.0.downsample.conv.",
            "e_b10.": "encoder.down.1.block.0.",
            "e_mid1.": "encoder.mid.block_1.",
            "e_mida.": "encoder.mid.attn_1.",
            "e_mid2.": "encoder.mid.block_2.",
            "e_norm_out.": "encoder.norm_out.",
            "e_conv_out.": "encoder.conv_out.",
            "quant_conv.": "quant_conv.",
            "post_quant_conv.": "post_quant_conv.",
            "d_conv_in.": "decoder.conv_in.",
            "d_mid1.": "decoder.mid.block_1.",
            "d_mida.": "decoder.mid.attn_1.",
            "d_mid2.": "decoder.mid.block_2.",
            "d_b10.": "decoder.up.1.block.0.",
            "d_b11.": "decoder.up.1.block.1.",
            "d_up1.": "decoder.up.1.upsample.conv.",
            "d_b00.": "decoder.up.0.block.0.",
            "d_b01.": "decoder.up.0.block.1.",
            "d_norm_out.": "decoder.norm_out.",
            "d_conv_out.": "decoder.conv_out.",
        }
        sd = {}
        for k, v in self.state_dict().items():
            for a, b in ren.items():
                if k.startswith(a):
                    sd[b + k[len(a):]] = v.numpy()
                    break
        return sd


def test_vae_full_parity_vs_torch_oracle():
    torch.manual_seed(1)
    model = _TorchVAE().eval()
    sd = model.export_state_dict()
    cfg = VAEConfig(in_channels=80, out_ch=80, ch=32, ch_mult=(1, 2),
                    num_res_blocks=1, down_layers=(0,), kernel_size=5,
                    z_channels=4, embed_dim=4)
    params = vae_from_torch(sd, cfg)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 80, 32).astype(np.float32)
    with torch.no_grad():
        ref_m = model.encode(torch.tensor(x)).numpy()
    ours_m = vae_encode_moments(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours_m), ref_m, rtol=1e-3, atol=1e-4)

    z = rng.randn(2, 4, 16).astype(np.float32)
    with torch.no_grad():
        ref_d = model.decode(torch.tensor(z)).numpy()
    ours_d = vae_decode(params, cfg, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ours_d), ref_d, rtol=1e-3, atol=1e-4)


def test_fold_weight_norm():
    torch.manual_seed(3)
    conv = nn.Conv1d(8, 16, 5)
    wn = nn.utils.weight_norm(conv)
    g = wn.weight_g.detach().numpy()
    v = wn.weight_v.detach().numpy()
    folded = fold_weight_norm(g, v)
    np.testing.assert_allclose(folded, wn.weight.detach().numpy(), rtol=1e-5,
                               atol=1e-6)


def test_remap_ema_state():
    from maa3_tpu.torch_import import remap_ema_state
    model_sd = {"blocks.0.attention.wq.weight": np.zeros(2),
                "proj_in.weight": np.zeros(3)}
    ema_sd = {"diffusion_modelblocks0attentionwqweight": np.ones(2),
              "diffusion_modelproj_inweight": np.full(3, 2.0),
              "decay": np.zeros(1), "num_updates": np.zeros(1)}
    out = remap_ema_state(ema_sd, model_sd)
    assert set(out) == set(model_sd)
    np.testing.assert_allclose(out["blocks.0.attention.wq.weight"], 1.0)
    np.testing.assert_allclose(out["proj_in.weight"], 2.0)
