"""Measure the PyTorch reference baseline at the BASELINE.json config
shapes (the reference publishes no numbers — BASELINE.md mandates
anchoring the parity comparison with our own torch measurement).

Builds the reference-equivalent torch model from HF configs (random
init — no network) with the reference's loss math (the torch oracle
from tests/) and times fwd+loss on CPU at the requested config:

  config 1: image-text pair (ViT + DistilBERT, TV loss), batch 8
  config 2: audio-visual  (HuBERT + ViT, AV loss), batch 8, 10 s audio

Usage: python scripts/torch_baseline.py [--config 1|2] [--iters 3]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import torch

from tests.torch_oracle import oracle_av_loss, oracle_tv_loss


def build_vit():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    return Dinov2WithRegistersModel(
        Dinov2WithRegistersConfig(
            image_size=224, patch_size=14, hidden_size=768,
            num_hidden_layers=12, num_attention_heads=12,
            num_register_tokens=4, mlp_ratio=4, layerscale_value=1.0,
        )
    ).eval()


def build_text():
    from transformers import DistilBertConfig, DistilBertModel

    return DistilBertModel(DistilBertConfig()).eval()


def build_audio():
    from transformers import HubertConfig, HubertModel

    return HubertModel(
        HubertConfig(do_stable_layer_norm=False, feat_extract_norm="group",
                     conv_bias=False)
    ).eval()


class Projection(torch.nn.Module):
    def __init__(self, hidden: int, dim: int = 512):
        super().__init__()
        self.projection1 = torch.nn.Linear(hidden, 512)
        self.layer_norm = torch.nn.LayerNorm(512)
        self.projection2 = torch.nn.Linear(512, dim)

    def forward(self, x):
        return self.projection2(self.layer_norm(self.projection1(x)))


def bench_config1(iters: int) -> dict:
    torch.manual_seed(0)
    vit, text = build_vit(), build_text()
    pv, pt = Projection(768), Projection(768)
    B = 8
    imgs = torch.randn(B, 3, 224, 224)
    ids = torch.randint(1, 30000, (B, 32))
    mask = torch.ones(B, 32)
    temp = torch.tensor(1.5)

    def step():
        with torch.no_grad():
            vfeats = pv(vit(pixel_values=imgs).last_hidden_state[:, 5:])
            tfeats = pt(text(input_ids=ids, attention_mask=mask.long()).last_hidden_state)
            out = oracle_tv_loss(tfeats, vfeats, mask, temp)
        return float(out["total"])

    step()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return {
        "config": "1 (CC3M image-text, batch 8, CPU)",
        "fwd_loss_ms": round(dt * 1e3, 1),
        "clips_per_sec": round(B / dt, 2),
    }


def bench_config2(iters: int) -> dict:
    torch.manual_seed(0)
    vit, audio = build_vit(), build_audio()
    pv, pa = Projection(768), Projection(768)
    B = 8
    imgs = torch.randn(B, 3, 224, 224)
    wav = torch.randn(B, 160_000) * 0.1
    temp = torch.tensor(1.5)

    def step():
        with torch.no_grad():
            # processor normalization quirk (reference model.py:56-62)
            w = (wav - wav.mean(1, keepdim=True)) / torch.sqrt(
                wav.var(1, unbiased=False, keepdim=True) + 1e-7
            )
            vfeats = pv(vit(pixel_values=imgs).last_hidden_state[:, 5:])
            afeats = pa(audio(w).last_hidden_state)
            out = oracle_av_loss(afeats, vfeats, temp)
        return float(out["total"])

    step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return {
        "config": "2 (AudioSet AV, batch 8, 10s audio, CPU)",
        "fwd_loss_ms": round(dt * 1e3, 1),
        "clips_per_sec": round(B / dt, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, choices=[1, 2], default=None)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()
    runs = [args.config] if args.config else [1, 2]
    for c in runs:
        result = bench_config1(args.iters) if c == 1 else bench_config2(args.iters)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
