"""CLIP / VQGAN parity vs minimal torch implementations of the public
architectures (test fixtures; verify both the converter and the forward)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _ClipBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.c_fc = nn.Linear(d, d * 4)
        self.mlp.gelu = _QuickGELU()
        self.mlp.c_proj = nn.Linear(d * 4, d)
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask=None):
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
        x = x + y
        return x + self.mlp.c_proj(self.mlp.gelu(self.mlp.c_fc(self.ln_2(x))))


def test_clip_matches_torch():
    torch.manual_seed(0)
    d, h, L, patch, res, emb = 64, 4, 2, 8, 32, 32
    tw, tl, th, ctx, vs = 48, 2, 4, 16, 100

    class CLIP(nn.Module):
        def __init__(self):
            super().__init__()

            class V(nn.Module):
                pass

            self.visual = V()
            self.visual.conv1 = nn.Conv2d(3, d, patch, patch, bias=False)
            self.visual.class_embedding = nn.Parameter(torch.randn(d) * 0.02)
            self.visual.positional_embedding = nn.Parameter(
                torch.randn((res // patch) ** 2 + 1, d) * 0.02
            )
            self.visual.ln_pre = nn.LayerNorm(d)
            self.visual.transformer = nn.Module()
            self.visual.transformer.resblocks = nn.ModuleList(
                [_ClipBlock(d, h) for _ in range(L)]
            )
            self.visual.ln_post = nn.LayerNorm(d)
            self.visual.proj = nn.Parameter(torch.randn(d, emb) * 0.02)
            self.token_embedding = nn.Embedding(vs, tw)
            self.positional_embedding = nn.Parameter(torch.randn(ctx, tw) * 0.02)
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList(
                [_ClipBlock(tw, th) for _ in range(tl)]
            )
            self.ln_final = nn.LayerNorm(tw)
            self.text_projection = nn.Parameter(torch.randn(tw, emb) * 0.02)
            self.logit_scale = nn.Parameter(torch.tensor(2.6593))

        def encode_image(self, im):
            x = self.visual.conv1(im).flatten(2).permute(0, 2, 1)
            cls = self.visual.class_embedding[None, None].expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], 1) + self.visual.positional_embedding
            x = self.visual.ln_pre(x).permute(1, 0, 2)
            for b in self.visual.transformer.resblocks:
                x = b(x)
            x = x.permute(1, 0, 2)
            return self.visual.ln_post(x[:, 0]) @ self.visual.proj

        def encode_text(self, toks):
            x = self.token_embedding(toks) + self.positional_embedding[: toks.shape[1]]
            T = toks.shape[1]
            mask = torch.full((T, T), float("-inf")).triu(1)
            x = x.permute(1, 0, 2)
            for b in self.transformer.resblocks:
                x = b(x, mask)
            x = x.permute(1, 0, 2)
            x = self.ln_final(x)
            x = x[torch.arange(x.shape[0]), toks.argmax(-1)]
            return x @ self.text_projection

    from dataclasses import replace

    from musketeer_tpu.models.clip import (
        convert_clip_state_dict, encode_image, encode_text,
    )

    m = CLIP().eval()
    params, cfg = convert_clip_state_dict(m.state_dict())
    cfg = replace(cfg, vision_heads=h, transformer_heads=th)
    im = torch.randn(2, 3, res, res)
    toks = torch.randint(1, vs - 1, (3, ctx))
    toks[:, -1] = vs - 1
    with torch.no_grad():
        ie_ref = m.encode_image(im).numpy()
        te_ref = m.encode_text(toks).numpy()
    ie = np.asarray(encode_image(params, cfg, jnp.asarray(im.numpy().transpose(0, 2, 3, 1))))
    te = np.asarray(encode_text(params, cfg, jnp.asarray(toks.numpy())))
    np.testing.assert_allclose(ie, ie_ref, atol=1e-4)
    np.testing.assert_allclose(te, te_ref, atol=1e-4)


def test_clip_modified_resnet_matches_torch():
    """RN-CLIP image tower vs a fresh torch statement of the published
    ModifiedResNet (anti-aliased bottlenecks + attention pool)."""
    torch.manual_seed(1)
    width, layers, res, out_dim = 8, (1, 1, 2, 1), 64, 16
    heads = width * 32 // 64

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride > 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential()
                self.downsample.add_module("-1", nn.AvgPool2d(stride))
                self.downsample.add_module(
                    "0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)
                )
                self.downsample.add_module("1", nn.BatchNorm2d(planes * 4))

        def forward(self, x):
            idn = x
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idn = self.downsample(x)
            return torch.relu(out + idn)

    class AttnPool(nn.Module):
        def __init__(self, spacial, dim, nheads, odim):
            super().__init__()
            self.positional_embedding = nn.Parameter(
                torch.randn(spacial**2 + 1, dim) / dim**0.5
            )
            for n in ("q", "k", "v"):
                setattr(self, f"{n}_proj", nn.Linear(dim, dim))
            self.c_proj = nn.Linear(dim, odim)
            self.num_heads = nheads

        def forward(self, x):
            import torch.nn.functional as F

            x = x.flatten(2).permute(2, 0, 1)
            x = torch.cat([x.mean(0, keepdim=True), x], 0)
            x = x + self.positional_embedding[:, None]
            out, _ = F.multi_head_attention_forward(
                query=x[:1], key=x, value=x,
                embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat(
                    [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
                ),
                bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
                out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias,
                use_separate_proj_weight=True, need_weights=False,
            )
            return out[0]

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width // 2, 3, 2, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width // 2)
            self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width // 2)
            self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(width)
            self.avgpool = nn.AvgPool2d(2)
            inp = width
            for li, n in enumerate(layers, start=1):
                planes = width * 2 ** (li - 1)
                blocks = [Bottleneck(inp, planes, 2 if li > 1 else 1)]
                inp = planes * 4
                blocks += [Bottleneck(inp, planes) for _ in range(n - 1)]
                setattr(self, f"layer{li}", nn.Sequential(*blocks))
            self.attnpool = AttnPool(res // 32, width * 32, heads, out_dim)

        def forward(self, x):
            for c, b in ((self.conv1, self.bn1), (self.conv2, self.bn2),
                         (self.conv3, self.bn3)):
                x = torch.relu(b(c(x)))
            x = self.avgpool(x)
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return self.attnpool(x)

    class RNCLIP(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual = Visual()
            self.token_embedding = nn.Embedding(50, 16)
            self.positional_embedding = nn.Parameter(torch.randn(8, 16) * 0.02)
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList([_ClipBlock(16, 2)])
            self.ln_final = nn.LayerNorm(16)
            self.text_projection = nn.Parameter(torch.randn(16, out_dim) * 0.02)
            self.logit_scale = nn.Parameter(torch.tensor(2.6593))

    from musketeer_tpu.models.clip import convert_clip_state_dict, encode_image

    m = RNCLIP()
    # non-trivial BN running stats
    with torch.no_grad():
        m.visual.train()(torch.randn(4, 3, res, res))
    m.eval()
    params, cfg = convert_clip_state_dict(m.state_dict())
    assert cfg.rn_layers == layers and cfg.vision_width == width
    assert cfg.image_resolution == res
    im = torch.randn(2, 3, res, res)
    with torch.no_grad():
        ref = m.visual(im).numpy()
    got = np.asarray(
        encode_image(params, cfg, jnp.asarray(im.numpy().transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def _gn(c):
    return nn.GroupNorm(32, c, eps=1e-6, affine=True)


def _sw(x):
    return x * torch.sigmoid(x)


class _Res(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        self.nin_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(_sw(self.norm1(x)))
        h = self.conv2(_sw(self.norm2(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class _Attn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _gn(c)
        self.q, self.k, self.v = (nn.Conv2d(c, c, 1) for _ in range(3))
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        B, C, H, W = q.shape
        q = q.reshape(B, C, H * W).permute(0, 2, 1)
        k = k.reshape(B, C, H * W)
        v = v.reshape(B, C, H * W)
        w = torch.softmax(torch.bmm(q, k) * (C**-0.5), dim=2)
        h = torch.bmm(v, w.permute(0, 2, 1)).reshape(B, C, H, W)
        return x + self.proj_out(h)


def test_vqgan_decode_matches_torch():
    torch.manual_seed(0)
    zc, ch = 64, 32

    class Up(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 1, 1)

        def forward(self, x):
            return self.conv(
                torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
            )

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(zc, ch * 2, 3, 1, 1)
            self.mid = nn.Module()
            self.mid.block_1 = _Res(ch * 2, ch * 2)
            self.mid.attn_1 = _Attn(ch * 2)
            self.mid.block_2 = _Res(ch * 2, ch * 2)
            self.up = nn.ModuleList()
            up0 = nn.Module()
            up0.block = nn.ModuleList([_Res(ch, ch), _Res(ch, ch)])
            up1 = nn.Module()
            up1.block = nn.ModuleList([_Res(ch * 2, ch), _Res(ch, ch)])
            up1.upsample = Up(ch)
            self.up.append(up0)
            self.up.append(up1)
            self.norm_out = _gn(ch)
            self.conv_out = nn.Conv2d(ch, 3, 3, 1, 1)

        def forward(self, z):
            h = self.conv_in(z)
            h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
            for i in reversed(range(2)):
                for b in self.up[i].block:
                    h = b(h)
                if i != 0:
                    h = self.up[i].upsample(h)
            return self.conv_out(_sw(self.norm_out(h)))

    class VQ(nn.Module):
        def __init__(self):
            super().__init__()
            self.quantize = nn.Module()
            self.quantize.embedding = nn.Embedding(50, zc)
            self.post_quant_conv = nn.Conv2d(zc, zc, 1)
            self.decoder = Dec()

        def decode_code(self, codes):
            z = self.quantize.embedding(codes).permute(0, 3, 1, 2)
            return self.decoder(self.post_quant_conv(z))

    from musketeer_tpu.models.vqgan import convert_vqgan_state_dict, decode_code

    m = VQ().eval()
    codes = torch.randint(0, 50, (2, 4, 4))
    with torch.no_grad():
        ref = m.decode_code(codes).numpy()
    params, cfg = convert_vqgan_state_dict(m.state_dict())
    out = np.asarray(decode_code(params, cfg, jnp.asarray(codes.numpy())))
    out = out.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ref, out, atol=1e-4)


def test_vqgan_encode_matches_torch():
    """Encoder direction: images → nearest-codebook ids, vs a minimal torch
    mirror of taming's Encoder/VectorQuantizer (model.py:342-412,
    quantize.py:34-60)."""
    torch.manual_seed(1)
    zc, ch = 64, 32

    class Down(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 2, 0)

        def forward(self, x):
            return self.conv(torch.nn.functional.pad(x, (0, 1, 0, 1)))

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(3, ch, 3, 1, 1)
            self.down = nn.ModuleList()
            d0 = nn.Module(); d0.block = nn.ModuleList([_Res(ch, ch)])
            d0.downsample = Down(ch)
            d1 = nn.Module(); d1.block = nn.ModuleList([_Res(ch, ch * 2)])
            self.down.append(d0); self.down.append(d1)
            self.mid = nn.Module()
            self.mid.block_1 = _Res(ch * 2, ch * 2)
            self.mid.attn_1 = _Attn(ch * 2)
            self.mid.block_2 = _Res(ch * 2, ch * 2)
            self.norm_out = _gn(ch * 2)
            self.conv_out = nn.Conv2d(ch * 2, zc, 3, 1, 1)

        def forward(self, x):
            h = self.conv_in(x)
            for d in self.down:
                for b in d.block:
                    h = b(h)
                if hasattr(d, "downsample"):
                    h = d.downsample(h)
            h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
            return self.conv_out(_sw(self.norm_out(h)))

    class VQ(nn.Module):
        def __init__(self):
            super().__init__()
            self.quantize = nn.Module()
            self.quantize.embedding = nn.Embedding(50, zc)
            self.post_quant_conv = nn.Conv2d(zc, zc, 1)
            self.quant_conv = nn.Conv2d(zc, zc, 1)
            self.encoder = Enc()
            # converter also needs a (tiny) decoder present
            self.decoder = nn.Module()
            self.decoder.conv_in = nn.Conv2d(zc, ch, 3, 1, 1)
            self.decoder.mid = nn.Module()
            self.decoder.mid.block_1 = _Res(ch, ch)
            self.decoder.mid.attn_1 = _Attn(ch)
            self.decoder.mid.block_2 = _Res(ch, ch)
            self.decoder.up = nn.ModuleList()
            u = nn.Module(); u.block = nn.ModuleList([_Res(ch, ch), _Res(ch, ch)])
            self.decoder.up.append(u)
            self.decoder.norm_out = _gn(ch)
            self.decoder.conv_out = nn.Conv2d(ch, 3, 3, 1, 1)

        def encode_ids(self, x):
            z = self.quant_conv(self.encoder(x))  # [B, zc, h, w]
            zf = z.permute(0, 2, 3, 1).reshape(-1, zc)
            e = self.quantize.embedding.weight
            d = (zf**2).sum(1, keepdim=True) + (e**2).sum(1) - 2 * zf @ e.t()
            return d.argmin(1).reshape(z.shape[0], z.shape[2], z.shape[3])

    from musketeer_tpu.models.vqgan import convert_vqgan_state_dict, encode_codes

    m = VQ().eval()
    imgs = torch.randn(2, 3, 16, 16).clamp(-1, 1)
    with torch.no_grad():
        ref_ids = m.encode_ids(imgs).numpy()
    params, cfg = convert_vqgan_state_dict(m.state_dict())
    assert "encoder" in params and "quant_conv" in params
    ids = np.asarray(
        encode_codes(params, cfg, jnp.asarray(imgs.permute(0, 2, 3, 1).numpy()))
    )
    assert ids.shape == ref_ids.shape == (2, 8, 8)
    np.testing.assert_array_equal(ref_ids, ids)


def test_vqgan_quantizer_train_matches_torch():
    """quantize_train (straight-through VQ + codebook/commit losses) vs a
    torch mirror of taming VectorQuantizer2.forward (quantize.py:62-78):
    same loss AND same gradients wrt encoder latents and codebook."""
    from musketeer_tpu.models.vqgan import quantize_train

    torch.manual_seed(3)
    beta = 0.25
    z_t = torch.randn(2, 4, 4, 8, requires_grad=True)
    emb_t = torch.randn(20, 8, requires_grad=True)
    d = (
        (z_t.reshape(-1, 8) ** 2).sum(1, keepdim=True)
        + (emb_t**2).sum(1)
        - 2 * z_t.reshape(-1, 8) @ emb_t.t()
    )
    ids_t = d.argmin(1)
    z_q = emb_t[ids_t].reshape(z_t.shape)
    loss_t = torch.mean((z_q - z_t.detach()) ** 2) + beta * torch.mean(
        (z_q.detach() - z_t) ** 2
    )
    z_q_st = z_t + (z_q - z_t).detach()
    total_t = 1.3 * z_q_st.sum() + loss_t
    total_t.backward()

    params = {"codebook": jnp.asarray(emb_t.detach().numpy())}

    def total_fn(z, emb):
        z_q_j, codes, q_loss = quantize_train({"codebook": emb}, z, beta=beta)
        return 1.3 * jnp.sum(z_q_j) + q_loss, codes

    (gz, ge), codes = (
        jax.grad(lambda z, e: total_fn(z, e)[0], argnums=(0, 1))(
            jnp.asarray(z_t.detach().numpy()), params["codebook"]
        ),
        total_fn(jnp.asarray(z_t.detach().numpy()), params["codebook"])[1],
    )
    np.testing.assert_array_equal(
        np.asarray(codes).reshape(-1), ids_t.numpy()
    )
    np.testing.assert_allclose(np.asarray(gz), z_t.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ge), emb_t.grad.numpy(), atol=1e-5)


def test_vqgan_autoencode_train_smoke():
    """End-to-end first-stage objective: encode→quantize→decode is
    differentiable, shape-preserving, and grads reach encoder, decoder and
    codebook (ref VQModel.training_step generator objective minus the
    perceptual/GAN terms — see PARITY.md won't-fix)."""
    from musketeer_tpu.models.vqgan import (
        autoencode_train, convert_vqgan_state_dict,
    )

    torch.manual_seed(5)
    zc, ch = 16, 32

    class Up(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 1, 1)

        def forward(self, x):
            return self.conv(
                torch.nn.functional.interpolate(x, scale_factor=2.0)
            )

    class Down(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 2, 0)

        def forward(self, x):
            return self.conv(torch.nn.functional.pad(x, (0, 1, 0, 1)))

    class VQ(nn.Module):
        def __init__(self):
            super().__init__()
            self.quantize = nn.Module()
            self.quantize.embedding = nn.Embedding(24, zc)
            self.quant_conv = nn.Conv2d(zc, zc, 1)
            self.post_quant_conv = nn.Conv2d(zc, zc, 1)
            self.encoder = nn.Module()
            self.encoder.conv_in = nn.Conv2d(3, ch, 3, 1, 1)
            d0 = nn.Module()
            d0.block = nn.ModuleList([_Res(ch, ch)])
            d0.downsample = Down(ch)
            self.encoder.down = nn.ModuleList([d0])
            self.encoder.mid = nn.Module()
            self.encoder.mid.block_1 = _Res(ch, ch)
            self.encoder.mid.attn_1 = _Attn(ch)
            self.encoder.mid.block_2 = _Res(ch, ch)
            self.encoder.norm_out = _gn(ch)
            self.encoder.conv_out = nn.Conv2d(ch, zc, 3, 1, 1)
            self.decoder = nn.Module()
            self.decoder.conv_in = nn.Conv2d(zc, ch, 3, 1, 1)
            self.decoder.mid = nn.Module()
            self.decoder.mid.block_1 = _Res(ch, ch)
            self.decoder.mid.attn_1 = _Attn(ch)
            self.decoder.mid.block_2 = _Res(ch, ch)
            # two levels: level 1 upsamples (decode walks high→low and only
            # levels != 0 upsample), level 0 doesn't
            u0 = nn.Module()
            u0.block = nn.ModuleList([_Res(ch, ch), _Res(ch, ch)])
            u1 = nn.Module()
            u1.block = nn.ModuleList([_Res(ch, ch), _Res(ch, ch)])
            u1.upsample = Up(ch)
            self.decoder.up = nn.ModuleList([u0, u1])
            self.decoder.norm_out = _gn(ch)
            self.decoder.conv_out = nn.Conv2d(ch, 3, 3, 1, 1)

    m = VQ().eval()
    params, cfg = convert_vqgan_state_dict(m.state_dict())
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 3) * 2 - 1,
                       jnp.float32)

    def loss_fn(p):
        recon, codes, losses = autoencode_train(p, cfg, imgs)
        return losses["loss"], (recon, codes, losses)

    (loss, (recon, codes, losses)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    # decoder upsamples back to the input resolution
    assert recon.shape == imgs.shape
    assert np.isfinite(float(loss))
    assert codes.shape == (1, 8, 8)
    gnorm = lambda sub: float(
        sum(np.abs(np.asarray(g)).sum() for g in jax.tree.leaves(sub))
    )
    assert gnorm(grads["encoder"]) > 0  # straight-through reaches encoder
    assert gnorm(grads["codebook"]) > 0
    assert gnorm(grads["up"]) > 0  # decoder grads
