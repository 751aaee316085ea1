"""Round-5 NaN mechanism probe: the r4e discrimination legs isolated
the perf-kernel NaN to the monolithic frontend's "xt" wave layout
(monofe,wavext -> 2/64 rows non-finite on the culprit batch; monofe
alone with the x10 layout -> 0/64). This probe runs JUST the frontend
on the culprit batch and discriminates inside the xt path:

  1. full monolithic_frontend xt vs x10 vs XLA reference: per-row
     finiteness of the token outputs;
  2. the GroupNorm stats pass alone (conv0_stats) for both layouts:
     finiteness + min over channels of var (the xt stats pass is the
     one xt-exclusive COMPONENT — a Gram-matrix quadratic form whose
     host-side einsum contraction runs at default matmul precision,
     which this platform downcasts to bf16; a negative var from that
     rounding makes rsqrt(var+1e-5) NaN);
  3. the same xt stats contraction forced to HIGHEST precision — if 2
     shows negative/NaN var and 3 is clean, the mechanism is proven.

usage: python scripts/tpu_nan_fe_xt_probe.py [npz]
"""

import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    npz = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nan_culprit.npz"
    audio_np = np.load(npz)["av_audio"]
    print(f"# audio {audio_np.shape} std={audio_np.std():.4f}",
          file=sys.stderr, flush=True)

    from triad_tpu.core.config import ModelConfig, apply_train_knobs
    from triad_tpu.models import init_triad_model
    from triad_tpu.models.hubert import normalize_waveform
    from triad_tpu.ops import pallas_frontend as mf

    cfg = apply_train_knobs(ModelConfig(), "monofe,wavext")
    params = init_triad_model(cfg, jax.random.key(0))
    fe = params["audio_backbone"]["feature_extractor"]
    w0 = fe["conv_0"]["kernel"]
    ws = [fe[f"conv_{i}"]["kernel"] for i in range(1, 7)]
    gn = fe["group_norm"]

    tb = cfg.hubert.frontend_tb
    wave = jnp.asarray(audio_np)

    def fe_out(wave, w0, scale, bias, ws, layout):
        return mf.monolithic_frontend(
            normalize_waveform(wave), w0,
            scale.astype(jnp.float32), bias.astype(jnp.float32),
            ws, tb=tb, gelu="tanh", wave_layout=layout,
        )

    def stats(wave, w0, layout, precision=None):
        """Replicates the wrapper's pad prep (pallas_frontend
        monolithic_frontend) for one layout, returns (mean, var)."""
        wv = normalize_waveform(wave)
        b, t = wv.shape
        t -= t % 10
        wv = wv[:, :t]
        n_out = mf.num_tokens(t)
        m0_total = (t - 10) // 5 + 1
        n_pairs = (m0_total + 1) // 2
        stb = mf.stats_block(n_pairs, wave_layout=layout)
        nbs = -(-n_pairs // stb)
        nb = -(-n_out // tb)
        p1 = 32 * tb + 32
        if layout == "xt":
            wg = mf.make_g2_weight_xt(w0.reshape(10, -1))
            main_lanes = (nb - 1) * (tb * 32) + mf._xt_load_len(p1)
            stats_lanes = (nbs - 1) * stb + mf._xt_load_len(stb)
            u_pad = mf._round_up_fe(
                max(main_lanes, stats_lanes, t // 10), 128
            )
            x10 = jnp.pad(
                wv.astype(jnp.float32), ((0, 0), (0, u_pad * 10 - t))
            ).reshape(b, u_pad, 10)
            x10 = jnp.pad(
                jnp.transpose(x10, (0, 2, 1)), ((0, 0), (0, 6), (0, 0))
            )
        else:
            wg = mf.make_g2_weight(w0.reshape(10, -1))
            r10 = t // 10
            stats_rows = nbs * stb + 8
            r_pad = max(32 * tb * (nb - 1) + p1 + 8, stats_rows, r10 + 8)
            x10 = jnp.pad(
                wv.astype(jnp.float32), ((0, 0), (0, r_pad * 10 - t))
            ).reshape(b, r_pad, 10)
        if precision is not None:
            with jax.default_matmul_precision(precision):
                return mf.conv0_stats(
                    x10, wg, m0_total, wave_layout=layout
                )
        return mf.conv0_stats(x10, wg, m0_total, wave_layout=layout)

    def report_rows(name, arr):
        a = np.asarray(arr, np.float32)
        fin = np.isfinite(a).all(axis=tuple(range(1, a.ndim)))
        bad = np.flatnonzero(~fin)
        print(json.dumps({
            "probe": name, "bad_rows": int(bad.size),
            "first_bad": bad[:8].tolist(),
        }), flush=True)
        return bad

    scale, bias = gn["scale"], gn["bias"]
    run = jax.jit(
        lambda wave, w0, scale, bias, *ws: (
            fe_out(wave, w0, scale, bias, list(ws), "xt"),
            fe_out(wave, w0, scale, bias, list(ws), "x10"),
        )
    )
    out_xt, out_x10 = run(wave, w0, scale, bias, *ws)
    report_rows("frontend out xt", out_xt)
    report_rows("frontend out x10", out_x10)

    st = jax.jit(
        lambda wave, w0: (
            stats(wave, w0, "xt"),
            stats(wave, w0, "x10"),
            stats(wave, w0, "xt", precision="float32"),
        )
    )
    (m_xt, v_xt), (m_x10, v_x10), (m_hi, v_hi) = st(wave, w0)
    for name, m, v in (
        ("stats xt default-precision", m_xt, v_xt),
        ("stats x10", m_x10, v_x10),
        ("stats xt HIGHEST-contraction", m_hi, v_hi),
    ):
        v_np = np.asarray(v, np.float64)
        m_np = np.asarray(m, np.float64)
        neg = v_np < -1e-5  # rsqrt(var + 1e-5) NaNs past this
        rows = np.flatnonzero(neg.any(axis=1))
        print(json.dumps({
            "probe": name,
            "var_min": float(np.nanmin(v_np)),
            "rows_with_var_below_-1e-5": rows[:8].tolist(),
            "n_rows_nan_mean": int((~np.isfinite(m_np)).any(1).sum()),
        }), flush=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    main()
