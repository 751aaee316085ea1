"""Sub-component timing of the HuBERT eval forward at B=64 (the bench's
dominant cost). Times each stage in isolation with the production knobs
(fused mlp, bf16 scores) to find where the gap to roofline lives.

Run: python scripts/tpu_audio_profile.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from triad_tpu.core.config import HubertConfig

B, T = 64, 160_000
NA = 499
# 20 iters: the axon tunnel readback costs ~30 ms RTT, which lands in
# the measurement as RTT/ITERS (scripts/tpu_elementwise_check.py).
ITERS = 20


def time_fn(label, fn, params, *args):
    def chained(params, *args):
        def body(c, _):
            pert = [a + (c * 1e-12).astype(a.dtype) for a in args]
            out = fn(params, *pert)
            return jnp.sum(out.astype(jnp.float32) * 1e-12), None

        r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return r

    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(params, *args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(params, *args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:46s} {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    sections = set(sys.argv[1:]) or {"full", "frontend", "posconv", "layers", "proj"}
    from triad_tpu.models.hubert import (
        ConvFeatureEncoder,
        HubertEncoderLayer,
        HubertModel,
        HubertSelfAttention,
        PositionalConvEmbedding,
        normalize_waveform,
    )

    cfg = dataclasses.replace(
        HubertConfig(), attention_scores_dtype="bfloat16", mlp_impl="fused"
    )
    rng = np.random.default_rng(0)
    audio = normalize_waveform(
        jnp.asarray((rng.normal(size=(B, T)) * 0.1).astype(np.float32))
    )
    hidden = jnp.asarray(
        (rng.normal(size=(B, NA, 768)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    feats = jnp.asarray(
        (rng.normal(size=(B, NA, 512)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)

    # full model
    model = HubertModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), audio[:1])["params"]
    if "full" in sections:
        time_fn(
            "full hubert fwd",
            lambda p, a: model.apply({"params": p}, a, deterministic=True),
            params, audio,
        )

    # frontend (chunked two-pass, as used) vs monolithic
    fe = ConvFeatureEncoder(cfg, dtype=jnp.bfloat16)
    fe_params = params["feature_extractor"]
    if "frontend" in sections:
        time_fn(
            "frontend monolithic",
            lambda p, a: fe.apply({"params": p}, a), fe_params, audio,
        )
        mono_cfg = dataclasses.replace(cfg, remat="none")
        model_mono = HubertModel(mono_cfg, dtype=jnp.bfloat16)
        time_fn(
            "full fwd (monolithic fe)",
            lambda p, a: model_mono.apply({"params": p}, a, deterministic=True),
            params, audio,
        )

    # conv_0 alone
    class Conv0(nn.Module):
        cfg: HubertConfig

        @nn.compact
        def __call__(self, a):
            return ConvFeatureEncoder(
                self.cfg, dtype=jnp.bfloat16, name="fe"
            ).conv0(a)

    c0 = Conv0(cfg)
    c0p = {"fe": fe_params}
    if "frontend" in sections:
        time_fn("conv_0 alone", lambda p, a: c0.apply({"params": p}, a), c0p, audio)

    # positional conv embedding
    pos = PositionalConvEmbedding(cfg, dtype=jnp.bfloat16)
    pos_params = params["pos_conv_embed"]
    if "posconv" in sections:
        time_fn(
            "pos conv embed (k=128, g=16)",
            lambda p, x: pos.apply({"params": p}, x), pos_params, hidden,
        )
        time_fn(
            "pos conv + residual + LN",
            lambda p, x: nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16).apply(
                {"params": {"scale": jnp.ones(768), "bias": jnp.zeros(768)}},
                x + pos.apply({"params": p}, x),
            ),
            pos_params, hidden,
        )

    # one encoder layer x12 (scan-free python loop, shared params ok for timing)
    layer = HubertEncoderLayer(cfg, dtype=jnp.bfloat16)
    lp = params["layer_0"]

    def layers12(p, x):
        for _ in range(12):
            x = layer.apply({"params": p}, x, True)
        return x

    if "layers" in sections:
        time_fn("12 encoder layers", layers12, lp, hidden)

    # attention sublayer x12
    attn = HubertSelfAttention(cfg, dtype=jnp.bfloat16)
    ap = lp["attention"]

    def attn12(p, x):
        for _ in range(12):
            x = attn.apply({"params": p}, x, True)
        return x

    if "layers" in sections:
        time_fn("12 attention sublayers", attn12, ap, hidden)

    # fused mlp x12
    from triad_tpu.ops.pallas_mlp import fused_mlp

    w1 = lp["intermediate_dense"]["kernel"].astype(jnp.bfloat16)
    b1 = lp["intermediate_dense"]["bias"].astype(jnp.bfloat16)
    w2 = lp["output_dense"]["kernel"].astype(jnp.bfloat16)
    b2 = lp["output_dense"]["bias"].astype(jnp.bfloat16)

    def mlp12(p, x):
        for _ in range(12):
            x = fused_mlp(x, p[0], p[1], p[2], p[3], jnp.zeros((), jnp.int32), 0.0)
        return x

    if "layers" in sections:
        time_fn("12 fused mlps", mlp12, (w1, b1, w2, b2), hidden)

    # projection head 768 -> 512 -> 512 (the multimodal wrapper's part)
    from triad_tpu.models.layers import ProjectionHead

    proj = ProjectionHead(512, dtype=jnp.bfloat16)
    pp = proj.init(jax.random.key(1), hidden[:1])["params"]
    if "proj" in sections:
        time_fn(
            "projection head", lambda p, x: proj.apply({"params": p}, x), pp, hidden
        )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
