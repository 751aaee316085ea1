"""Typed configuration for the triad_tpu framework.

The reference has no config system (hard-coded kwargs at
reference src/train.py:1148-1183 with ctor defaults at train.py:56-89, and
hard-coded model hyperparameters at train.py:235-244 / model.py:331-353).
Here every knob is a frozen dataclass; the full config travels inside
checkpoints (mirroring the reference's ``self.config`` dict persisted at
train.py:126-143, 427) and is serializable to/from plain dicts (JSON/YAML).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


# ---------------------------------------------------------------------------
# Encoder configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    """DINOv2 ViT-B/14 with register tokens (reference model.py:346:
    ``ViTLoRAEmbedder(arch='dinov2_vitb14_reg', embedding_dim=512, ...)``).

    Matches the HF ``Dinov2WithRegistersModel`` / facebookresearch DINOv2
    architecture so pretrained weights port 1:1.
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    layerscale_init: float = 1.0
    ffn_bias: bool = True
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-6
    # LoRA on attention qkv + output proj (reference model.py:227-248:
    # r=8, alpha=16, targets ["attn.qkv", "attn.proj"], dropout 0.0).
    lora_rank: int = 8
    lora_alpha: float = 16.0
    # "folded": y = x @ (W + s·A@B) — one MXU pass over the activation,
    # but re-materializes the merged (768, 2304) qkv weight every apply
    # (fwd AND remat recompute; the r5 train trace prices those
    # bf16[768,2304] assembly fusions at 9.75 ms/step across 24 calls).
    # "separate": peft-shaped x@W + s·(x@A)@B — no weight assembly,
    # two extra skinny matmuls on the activation.
    lora_compute: str = "folded"
    # "float32" = torch-parity softmax; "bfloat16" = fast TPU softmax.
    attention_scores_dtype: str = "float32"
    # "xla" = materialized softmax attention; "flash" = fused pallas
    # kernel (no probs in HBM; bf16/fp32-accum numerics; falls back to
    # XLA while attention dropout is active — models/layers.py).
    attention_impl: str = "xla"
    # "xla" = Dense/gelu/Dense; "fused" = single pallas fc1+gelu+fc2
    # kernel (faster on TPU, bf16-rounding-level numerics difference).
    mlp_impl: str = "xla"
    # GELU form inside the fused MLP kernel: "erf" (HF parity) or
    # "tanh" (max abs err 4.7e-4 — below bf16 rounding; cheaper VPU
    # transcendental, same swap that won the conv frontend 44.7->28.5
    # ms). Only affects mlp_impl="fused".
    mlp_gelu: str = "erf"
    # Batch rows merged per fused-MLP grid step (must divide B; 1 = off).
    # Raises the per-step matmul M from T to rb*T (fewer pipeline
    # bubbles, better MXU utilization); numerics identical. VMEM-bounded:
    # eval-only rb=4 fits, training's backward caps at rb=2.
    mlp_block_rows: int = 1
    # Token-dim padding for the packed/merged EVAL attention kernels:
    # "hbm" pads q/k/v (or merged qkv) to 8/128-multiples with jnp.pad
    # (a full-tensor HBM copy per layer, ~4.8 ms/step total at B=64);
    # "none" feeds the ragged N straight in (Mosaic pads VMEM tiles
    # internally). Numerics identical; A/B knob until hardware-proven.
    attention_pad: str = "hbm"

    @property
    def num_patches(self) -> int:
        side = self.image_size // self.patch_size
        return side * side

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class HubertConfig:
    """HuBERT-base (reference model.py:27-30: facebook/hubert-base-ls960).

    Matches HF ``HubertModel`` base config: 7-layer conv feature encoder
    with group norm on layer 0, conv positional embedding, 12-layer
    post-LN transformer.
    """

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_proj_layer_norm: bool = True
    layer_norm_eps: float = 1e-5
    # HF processor quirk (reference model.py:56-62): zero-mean/unit-var
    # normalization applied per padded batch row before the conv stack.
    normalize_waveform: bool = True
    # "float32" = torch-parity softmax; "bfloat16" = fast TPU softmax.
    attention_scores_dtype: str = "float32"
    # MLP implementation: "auto" (default) = fused pallas
    # fc1+gelu+dropout+fc2 kernel (ops/pallas_mlp.py) when training with
    # activation dropout on a TPU backend, XLA elsewhere; "xla"/"fused"
    # force one.
    mlp_impl: str = "auto"
    # GELU form inside the fused MLP kernel ("erf" parity / "tanh"
    # fast, <=4.7e-4 abs err). Only affects the fused pallas path.
    mlp_gelu: str = "erf"
    # Batch rows merged per fused-MLP grid step (see VitConfig field).
    mlp_block_rows: int = 1
    # Eval-attention token padding ("hbm"/"none" — see VitConfig field).
    attention_pad: str = "hbm"
    # "auto" (default): fused pallas attention+dropout kernel
    # (ops/pallas_attention.py) when training with attention dropout on
    # a TPU backend — 2.3x faster than the XLA path there (the
    # (B, H, T, T) probs/mask HBM traffic disappears) — and XLA
    # everywhere else (eval, CPU, p=0, where XLA measured faster).
    # "xla" / "fused" / "flash" force one implementation. Packed-layout
    # kernels (no (B, H, N, D) transposes around the kernel): "packed"
    # (eval, delayed normalization) and "fused_packed" (training).
    # Merged-qkv variants "packed_merged" / "fused_packed_merged"
    # additionally compute q|k|v as ONE (C, 3C) matmul whose output
    # feeds the kernel directly (q/k/v are lane offsets in-kernel, no
    # split slices — the relayout copies that sank the round-1 merge).
    attention_impl: str = "auto"
    # "auto" (default): fused pallas dropout+residual+LayerNorm kernel
    # (ops/pallas_ln.py) when training with hidden dropout on a TPU
    # backend (removes the two per-layer (B, T, C) HBM dropout masks and
    # the separate add/normalize passes), XLA elsewhere. "xla"/"fused"
    # force one.
    ln_impl: str = "auto"
    # Batch rows merged per fused-LN grid step (must divide B; 1 = off).
    # LN's per-step work is ~0.06 ms of bandwidth, so the rb=1 kernel is
    # bubble-dominated (lost the eval A/B 611.2 vs 616.1); merging rows
    # cuts grid steps rb-fold with negligible VMEM. Exact math.
    ln_block_rows: int = 1
    # "conv" = XLA conv lowering; "matmul" = im2col reshape + MXU matmul
    # (identical numerics; slower end-to-end); "pallas" = fused
    # stride-2 conv kernels with the inter-layer GroupNorm/GELU applied
    # in VMEM (ops/pallas_conv.py — the eval trace showed XLA paying
    # ~60% over roofline for the elementwise passes between convs;
    # conv_0 stays XLA). Backward falls back to the XLA reference VJP.
    frontend_impl: str = "conv"
    # Activation inside the "monolithic" pallas frontend ONLY (the
    # default "conv" path always uses exact GELU): "tanh" (tanh-form
    # GELU, max abs err 4.7e-4 — below bf16 rounding at unit scale;
    # 44.7 -> 28.5 ms on-chip at B=64, within 1.4 ms of the
    # no-activation floor) or "erf" (exact GELU via the A&S rational —
    # its exp+divide costs ~16 ms of VPU and made the kernel lose
    # end-to-end in round 2's first attempt).
    frontend_gelu: str = "tanh"
    # Waveform shipping layout for the "monolithic" frontend: "x10"
    # ((B, T/10, 10) — lane dim tiles 10->128, ~12.8x padded HBM
    # footprint plus a measured 1.35 ms/step XLA pad+relayout at
    # B=64/10 s), "x640" ((B, T/640, 640) — exact lane tiling; the
    # (rows, 640)->(rows*64, 10) re-view is a Mosaic-unsupported shape
    # cast on real hardware — kept for interpret A/Bs only), or "xt"
    # ((B, 16, T/10) tap planes — 16/10 footprint, conv_0 as one
    # sublane-contracting matmul, one lane roll for the odd phase).
    frontend_wave_layout: str = "x10"
    # Final tokens per "monolithic"-frontend grid block (multiple of 8;
    # xt needs tb % 4 == 0). Larger blocks amortize per-step pipeline
    # overhead against more VMEM (conv_0 block output is tb*32 x 1024
    # f32). 64 = round-2 tuned value; sweep knob for hardware A/Bs.
    frontend_tb: int = 64
    # Positional grouped conv (kernel 128, 16 groups): "conv" = XLA's
    # feature-grouped convolution (pays ~6.9 ms/step of {0,3,2,1}
    # pad/relayout fusions plus an 8.3 ms dW reduction at B=64 train —
    # round-2 trace); "pallas" = the fused packed-layout kernel with a
    # custom VJP (ops/pallas_posconv.py).
    posconv_impl: str = "conv"
    # Rematerialization for the backward pass: "none", "conv" (remat the
    # whole waveform frontend), "chunked_conv" (default: evaluate the
    # frontend in independent token blocks, each rematted — its
    # activations dominate HBM, ~9 GB at B=64/10 s, and VALID convs are
    # temporally local so chunks are exact), or "full" (also remat each
    # transformer layer; measured worse — fights XLA's own scheduler).
    remat: str = "chunked_conv"
    frontend_chunk_tokens: int = 128
    # Training dropouts (HF HubertConfig defaults — active in the
    # reference because model.train() leaves HF dropouts on).
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    layerdrop: float = 0.1
    # SpecAugment time masking (HF HubertConfig defaults — ACTIVE in the
    # reference's training forwards: model.train() leaves HF's
    # apply_spec_augment on, so ~5% of audio tokens are masked with the
    # learned masked_spec_embed vector each step;
    # modeling_hubert._mask_hidden_states). The masked_spec_embed param
    # exists iff mask_time_prob > 0 (HF's creation rule).
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2

    def num_audio_tokens(self, num_samples: int) -> int:
        """Output sequence length of the conv feature encoder."""
        t = num_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


@dataclass(frozen=True)
class DistilBertConfig:
    """DistilBERT-base-uncased (reference model.py:335, 345; train.py:238)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12
    # "float32" = torch-parity softmax; "bfloat16" = fast TPU softmax.
    attention_scores_dtype: str = "float32"
    # "xla" = materialized softmax attention; "flash" = fused pallas
    # kernel (no probs in HBM; bf16/fp32-accum numerics; falls back to
    # XLA while attention dropout is active — models/layers.py).
    attention_impl: str = "xla"
    # Training dropouts (HF DistilBertConfig defaults).
    dropout: float = 0.1
    attention_dropout: float = 0.1
    # Tokenization inside the reference forward (model.py:102-109):
    # padding, truncation, add_special_tokens=False, max_length=128.
    max_text_tokens: int = 128


# ---------------------------------------------------------------------------
# Model / loss configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """The combined tri-modal model (reference MultiModalModel,
    model.py:331-353)."""

    embedding_dim: int = 512
    temperature_init: float = 1.5  # trainer value, train.py:239
    visual_dropout_prob: float = 0.25  # train.py:242
    vit: ViTConfig = field(default_factory=ViTConfig)
    hubert: HubertConfig = field(default_factory=HubertConfig)
    text: DistilBertConfig = field(default_factory=DistilBertConfig)
    # bf16 compute for the encoders, fp32 for the loss path
    # (reference autocast split, model.py:483-487, 603-607).
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclass(frozen=True)
class LossConfig:
    """Loss hyperparameters (reference model.py:331-353, 394-428, 516-542)."""

    # AV regularizers (model.py:410-428)
    av_nonneg_clamp_min: float = -60.0
    av_nonneg_weight: float = 0.15
    temp_cal_weight: float = 20.0
    temp_cal_low: float = 1.0
    temp_cal_high: float = 2.0  # computed but unused in reference (model.py:422-424)
    smooth_weight: float = 0.01
    # TV regularizers (model.py:516-542; values from train.py:240-241)
    tv_nonneg_clamp_min: float = -20.0
    tv_nonneg_weight: float = 0.15
    patch_sparsity_threshold: float = 0.80
    patch_sparsity_weight: float = 0.01
    # Aggregation implementation: "dense" materializes the (B,B,Nq,Nk)
    # volume (small batches / tests), "chunked" scans j-blocks with
    # remat (autodiff backward), "chunked_vjp" adds a hand-written
    # backward (bf16 recompute, no residual stash), "pallas" uses the
    # fused TPU kernel.
    implementation: str = "dense"
    # Distributed in-batch negatives (parallel/dp.py): "all_gather"
    # materializes the global key tokens on every chip (0.4 GB at
    # global 512); "ring" ppermutes one key shard around the data axis
    # — peak key memory 2 shards at any global batch, identical
    # semantics (single mesh axis only).
    negatives: str = "all_gather"
    chunk_size: int = 8
    # Matmul precision of the aggregation einsums: "highest" reproduces
    # the reference's fp32 loss math bit-closely (parity tests);
    # "default" lets bf16 features ride the MXU natively (~3.5x faster
    # aggregation, production path).
    matmul_precision: str = "highest"
    # Storage dtype of the (Bq, chunk, Nq, Nk) token-sim volume between
    # the matmul and its max/clamp consumers: "float32" (parity
    # default) or "bfloat16" — the matmul still accumulates in f32 on
    # the MXU, only the HBM round-trip of the volume is rounded to
    # bf16, halving the loss path's dominant memory traffic (the same
    # contract as attention_scores_dtype="bfloat16": bf16-or-better
    # numerics; the max/mean/clamp^2 reductions stay f32).
    volume_dtype: str = "float32"


# ---------------------------------------------------------------------------
# Data / train configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DataConfig:
    # Fixed shapes (XLA requirement). The reference pads audio to the batch
    # max (dataset.py:264-276) and tokenizes to the batch max (model.py:102-109);
    # we pad to these static lengths instead.
    audio_num_samples: int = 160_000  # 10 s @ 16 kHz
    sample_rate: int = 16_000
    image_size: int = 224
    max_text_tokens: int = 128
    batch_size_av: int = 22  # train.py:1157
    batch_size_tv: int = 22  # train.py:1158
    num_workers: int = 4
    # "thread" (in-process pool) or "process" (spawned decode workers;
    # true CPU parallelism for python-heavy decode — the analog of the
    # reference's 10 DataLoader worker processes, train.py:161).
    worker_mode: str = "thread"
    prefetch: int = 2
    # Ship raw uint8 frames + int16 audio + per-sample draw params and
    # run the augmentation math on the accelerator (data/device_aug.py):
    # host cost per clip drops to one memcpy and the host->device image
    # bytes drop 4x. Draws stay keyed on (seed, epoch, batch, idx) —
    # exact-resume semantics unchanged; math identical to the host path
    # (tests/test_device_aug.py). Needs a dataset exposing raw_item
    # (TriadPack shards); silently falls back to host augmentation
    # otherwise (AVLoader semantics).
    device_augment: bool = False
    # Paths (None => synthetic data)
    audio_visual_data_root: Optional[str] = None
    text_dataset_path: Optional[str] = None
    audio_visual_val_data_root: Optional[str] = None
    text_dataset_val_path: Optional[str] = None
    tokenizer_vocab: Optional[str] = None  # path to a WordPiece vocab.txt
    # Synthetic dataset sizes when no real data is configured.
    synthetic_av_size: int = 256
    synthetic_tv_size: int = 256
    # Grounded synthetic data: class-keyed square/tone/word
    # correspondences (a LEARNABLE dense-grounding task) instead of
    # noise pairs — lets a from-scratch run demonstrate real learning
    # without media (see tests/test_learning.py). Classes <= 8.
    synthetic_grounded: bool = False
    synthetic_grounded_classes: int = 4
    # Draw AV batches with unique source-video ids (no same-video false
    # negatives in a contrastive batch — the reference's
    # VideoBatchSampler intent, dataset.py:137-164, defined there but
    # never wired). Ids derive from filenames: a trailing _<digits>
    # clip-index is stripped, so "ytid_30_40.mp4" and "ytid_40_50.mp4"
    # share an id.
    unique_videos: bool = False


@dataclass(frozen=True)
class OptimConfig:
    """4-group optimizer setup (reference train.py:246-348, 527-548)."""

    learning_rate: float = 1e-4
    # Per-group peak-LR scaling (train.py:302-343).
    lr_scale_others: float = 1.0
    lr_scale_audio: float = 0.25
    lr_scale_text: float = 0.75
    lr_scale_vit_lora: float = 0.5
    # OneCycle shape (train.py:302-343).
    pct_start: float = 0.1
    div_factor: float = 10.0
    final_div_factor: float = 1e4
    # Unfreeze steps (train.py:1169-1171).
    unfreeze_audio_step: int = 5000
    unfreeze_text_step: int = 5000
    unfreeze_vit_step: int = 5000
    # Grad clip: reference clips audio_embedder.* and text_embedder.*
    # subtrees to global-norm 10.0 (train.py:1004-1006).
    clip_norm: float = 10.0
    gradient_accumulation_steps: int = 4  # train.py:1168
    weight_decay: float = 0.01  # torch AdamW default
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    # torch OneCycleLR cycles beta1 by default (cycle_momentum=True) —
    # the reference's 4 schedulers inherit this (train.py:302-343), so
    # beta1 anneals 0.95 -> 0.85 -> 0.95 along each group's cycle.
    cycle_momentum: bool = True
    base_momentum: float = 0.85
    max_momentum: float = 0.95
    # Adam moment storage dtype (TPU memory knob, not a reference
    # feature — the reference keeps fp32 moments). "bfloat16" halves
    # optimizer state (~2 GB -> ~1 GB for the tri-modal model), buying
    # HBM headroom for bigger per-chip batches / less XLA remat.
    # Moment *updates* always compute in fp32 and round on store.
    mu_dtype: str = "float32"
    nu_dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    num_epochs: int = 10  # train.py:1159
    steps_per_epoch: Optional[int] = None  # None => derived from data size
    # Curriculum phases (train.py:880-905; values train.py:1176-1180).
    av_focus_epochs: int = 1
    tv_warmup_epochs: int = 1
    weighted_joint_epochs: int = 2
    av_weight_start: float = 0.8
    av_weight_end: float = 0.5
    # Periodic hooks (train.py:1162-1175).
    vis_every: int = 20000
    save_every_steps: int = 10000
    # Async checkpointing: save() returns once arrays are snapshotted
    # to host; the filesystem write overlaps the next train steps
    # (train/checkpoint.py — read paths drain in-flight saves first).
    async_checkpointing: bool = False
    validation_frequency: int = 20000
    retrieval_subset_size: int = 1000
    num_vis_samples_av: int = 24
    num_vis_samples_tv: int = 24
    # jax.profiler trace of the first N steps (0 = off); trace lands in
    # <output_dir>/profile for TensorBoard.
    profile_steps: int = 0
    output_dir: str = "./outputs_triad_tpu"
    use_wandb: bool = False
    project_name: str = "triad-tpu"
    seed: int = 0
    optim: OptimConfig = field(default_factory=OptimConfig)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. Parity needs pure DP (SURVEY §2.6); the axis is kept
    named so that model/sequence axes can be added later."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None => all visible devices
    # Multi-slice scale-out: with num_slices > 1 the mesh is 2-D
    # (num_slices, num_devices/num_slices); ``replica_axis`` spans pod
    # slices (DCN), ``data_axis`` the chips within a slice (ICI). The
    # batch shards over BOTH axes and in-batch negatives gather
    # globally (parallel/dp.py multi-axis collectives).
    num_slices: int = 1
    replica_axis: str = "replica"
    # Tensor (model) parallelism: with tp > 1 the mesh is 2-D
    # (num_devices/tp, tp) and parameters shard Megatron-style over
    # ``model_axis`` (parallel/tp.py); the batch shards over
    # ``data_axis`` only and the distributed loss is unchanged.
    # Requires the XLA impl knobs (pallas kernels are opaque to the
    # GSPMD partitioner) — "auto" knobs are resolved to "xla", explicit
    # pallas knobs are rejected. Composes with zero1 (moments shard
    # over 'data' on top of their param's TP spec) AND with
    # num_slices > 1 (3-D (replica, data, model) mesh — each TP group
    # stays inside one slice so no Megatron psum crosses DCN;
    # parallel/tp.py make_multislice_tp_mesh).
    tp: int = 1
    model_axis: str = "model"
    # FSDP / ZeRO-3: store every large parameter sharded over the data
    # axis; GSPMD all-gathers each layer's weights at use and
    # reduce-scatters their grads (parallel/fsdp.py). Same per-step
    # wire bytes as DP's grad all-reduce. Composes with tp (extends the
    # Megatron specs), zero1 (moments inherit the sharded specs), and
    # num_slices > 1 (shards stay over the intra-slice 'data' axis —
    # per-use gathers ride ICI, params replicate across 'replica').
    # Like tp, forces the XLA impl knobs.
    fsdp: bool = False
    # ZeRO-1: shard Adam moments (+ grad accumulator) over the data axis
    # instead of replicating them (parallel/zero.py). Bitwise-identical
    # math; frees ~(1 - 1/N) of the moment HBM per chip.
    zero1: bool = True


@dataclass(frozen=True)
class PretrainedConfig:
    """Where to find pretrained weights at startup. The reference fetches
    HuBERT/DistilBERT from the HF hub and DINOv2 from torch.hub
    (model.py:29-30, 79-80, 218); here the on-disk artifacts are named
    explicitly and loaded offline (models/hf_import.py). All optional —
    None means fresh initialization for that backbone."""

    # HF snapshot directory (config.json + model.safetensors [sharded ok]
    # or pytorch_model.bin), e.g. a local facebook/hubert-base-ls960.
    hubert: Optional[str] = None
    # HF snapshot directory, e.g. a local distilbert-base-uncased.
    text: Optional[str] = None
    # HF snapshot directory (dinov2-with-registers-base layout) OR a
    # torch.hub .pth state-dict file (dinov2_vitb14_reg_pretrain.pth).
    vit: Optional[str] = None
    # A trained reference checkpoint_epoch{E}_step{S}.pt — overrides the
    # per-backbone paths (it carries heads + temperature too).
    reference_checkpoint: Optional[str] = None

    def any(self) -> bool:
        return any(
            (self.hubert, self.text, self.vit, self.reference_checkpoint)
        )


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    pretrained: PretrainedConfig = field(default_factory=PretrainedConfig)

    # -- serialization -------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return _from_dict(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))


def _from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    hints = {f.name: f.type for f in dataclasses.fields(cls)}
    resolved = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in d.items():
        if key not in resolved:
            raise KeyError(f"Unknown config field {key!r} for {cls.__name__}")
        f = resolved[key]
        ftype = f.type
        # Resolve nested dataclasses by inspecting the default factory.
        default = (
            f.default_factory() if f.default_factory is not dataclasses.MISSING else None
        )
        if dataclasses.is_dataclass(default) and isinstance(value, dict):
            kwargs[key] = _from_dict(type(default), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def perf_eval_model_config() -> ModelConfig:
    """The tuned single-chip eval/bench configuration (bench.py and
    scripts/tpu_profile_trace.py share it so the trace always profiles
    the judged program).

    Every knob keeps the bf16-or-better numerics contract; deltas vs the
    parity defaults are within bf16 rounding (tests/test_pallas_mlp.py,
    tests/test_pallas_frontend.py):

    - bf16 softmax scores in all three encoders (halves score HBM traffic);
    - fused pallas MLP kernels with tanh-form GELU (abs err <= 4.7e-4);
    - monolithic pallas conv frontend with tanh GELU (44.7 -> 28.5 ms,
      docs/TRAINING_PERF.md round 2);
    - merged-qkv packed eval attention in the ViT (round 3): the LoRA
      projection already emits one (B, N, 3C) qkv tensor — the merged
      kernel consumes it directly, deleting the three lane slices +
      (B, H, N, D) transposes + pad-to-384 relayouts. Measured
      573.7-576.9 -> 589.1-592.1 clips/s/chip (two independent runs
      each, /tmp/r2_measure bench_base*/bench_vitmq* Aug 19). HuBERT
      merged-qkv measured a LOSS at eval (563.9) — its q/k/v are three
      separate Dense params and the one-big-matmul saving does not
      cover the merged kernel's padding at T=499; it stays packed.
    - round-3 hardware session (runbooks r3b-r3d, measurement log in
      docs/TRAINING_PERF.md): "xt" tap-plane waveform layout
      (589.2 -> 608.3) and ragged-N attention (attention_pad="none":
      616.1 -> 651.3 with the unrolled loss — the jnp.pad HBM copies
      around the packed/merged kernels disappear). Retired by the same
      session's measurements: pallas posconv at eval (583.0), bf16
      param storage (598.9), fused-MLP row merging (563.0), fused
      add+LN at eval (611.2), frontend tb 128/256 (600.2/609.2).
    """
    base = ModelConfig()
    return dataclasses.replace(
        base,
        vit=dataclasses.replace(
            base.vit, attention_scores_dtype="bfloat16", mlp_impl="fused",
            mlp_gelu="tanh", attention_impl="packed_merged",
            attention_pad="none",
        ),
        hubert=dataclasses.replace(
            base.hubert, attention_scores_dtype="bfloat16", mlp_impl="auto",
            mlp_gelu="tanh", frontend_impl="monolithic", frontend_gelu="tanh",
            frontend_wave_layout="xt", attention_pad="none",
            # Packed-layout eval attention kernel (no (B, H, N, N) probs
            # HBM round-trip, no qkv transposes): 2.76 vs 3.44 ms/layer
            # vs the bf16-scores XLA path at (64, 499, 12, 64)
            # (scripts/tpu_attn_eval_check.py). ViT stays XLA: its 261
            # tokens pad to 384 lanes and the kernel measured neutral.
            attention_impl="packed",
        ),
        text=dataclasses.replace(base.text, attention_scores_dtype="bfloat16"),
    )


def perf_train_model_config() -> ModelConfig:
    """The tuned single-chip TRAINING configuration (the knob set
    scripts/tpu_train_bench.py calls "tanh,pkattn,vitpk,monofe";
    measurement log in docs/TRAINING_PERF.md: 634.9 -> 491.9 ms joint
    step at B=64). Every knob keeps the bf16-or-better numerics
    contract; the parity defaults (erf GELU, XLA attention dispatch,
    exact-erf conv frontend) stay for torch comparisons.

    - tanh-form GELU in the fused MLP kernels (abs err <= 4.7e-4,
      below bf16 rounding at unit scale) + fused ViT MLP at train;
    - packed-layout training attention in HuBERT AND ViT
      (ops/pallas_attention.fused_attention_packed): flash-style
      recompute backward on the projections' native (B, N, H*D)
      layout — no probs HBM round-trips, no (B, H, N, D) transpose
      or pad-to-384-lane copies (611.7 -> 570.7 -> 510.7 ms);
    - monolithic pallas conv frontend forward with XLA-recompute
      backward (510.7 -> 491.9 ms);
    - round 3: bf16 backward recompute (491.9 -> 461.8, see
      docs/TRAINING_PERF.md), pallas pos-conv (459.8 -> 455.7 on the
      re-measured base), the xt waveform layout (-> 452.4) and ragged-N
      attention (attention_pad="none", -> 442.6 — the pad copies around
      the training kernels' fwd AND custom-VJP bwd disappear; grads
      bit-identical to the padded path on-chip,
      scripts/tpu_attnpad_check.py). Retired by measurement at train:
      loss=pallas (462.5), mlprows2 (496.1), mqkv (458.2, within
      drift), noremat/rematconv (453.8/453.9 — the chunked recompute
      policy is already at its floor).
    """
    base = ModelConfig()
    return dataclasses.replace(
        base,
        vit=dataclasses.replace(
            base.vit, mlp_impl="fused", mlp_gelu="tanh",
            attention_impl="fused_packed", attention_pad="none",
        ),
        hubert=dataclasses.replace(
            base.hubert, mlp_gelu="tanh", attention_impl="fused_packed",
            frontend_impl="monolithic", frontend_gelu="tanh",
            posconv_impl="pallas", frontend_wave_layout="xt",
            attention_pad="none",
        ),
    )


def perf_train_loss_config() -> LossConfig:
    """The codified production TRAINING loss path — one source of truth
    shared by configs/v5e8_scale.yaml, the soak/ingest harnesses and
    scripts/tpu_train_bench.py (each previously hand-built a drifting
    copy):

    - chunked_vjp: hand-written bf16 chunk-recompute backward (the
      measured training winner — 461.8 ms vs 463.6 for loss=pallas at
      B=64; docs/TRAINING_PERF.md round 2);
    - chunk_size 32: the DP-512 composed winner (r3h sweep), neutral at
      the single-chip B=64 shape;
    - matmul_precision "default": bf16-operand / f32-accum aggregation;
    - volume_dtype "bfloat16" (r5): the VJP's per-chunk sim volumes
      ride HBM as bf16 fwd AND in the recompute backward — 447.2 ->
      441.1 ms same-session A/B at B=64 (the loss backward's f32 chunk
      volumes dominated its 46.5 ms bucket in the r5 accounting
      table). Grad equivalence pinned by TestBf16Volume."""
    return LossConfig(
        implementation="chunked_vjp", chunk_size=32,
        matmul_precision="default", volume_dtype="bfloat16",
    )


def perf_eval_loss_config() -> LossConfig:
    """Production loss path for the eval bench: chunked bf16-operand
    aggregation with fp32 accumulation (bit-equal to the fp32-HIGHEST
    volume for bf16-valued features — tests/test_losses.py).

    The pallas maxmean kernel wins ISOLATED (8.95 vs 20.4 ms fwd at
    Bq=Bk=64 — scripts/tpu_maxmean_dp_check.py) but measured ~3.5
    ms/step SLOWER inside the full eval program (A/B/A: 575.1 / 557.4 /
    574.6 clips/s, round-2 second half). RESOLVED from the xplane
    traces (docs/TRAINING_PERF.md "composition effect"): in-program the
    chunked scan costs 3.1 ms/step (bf16 matmuls, normalize/temperature
    fused into neighbors) vs the kernel's 7.0 — the isolated
    chained-timing numbers do not transfer. chunked is the judged
    config; override with TRIAD_BENCH_LOSS for A/Bs.

    Round 3: "chunked_unrolled" (same math, scan Python-unrolled so XLA
    schedules/overlaps the chunk programs freely) measured +9.6 clips/s
    at B=64 (598.8 vs 589.2) and composes with the xt frontend (616.1)
    and ragged-N attention (651.3); it also wins at the global-512 key
    set (109.6 vs 111.1 ms composed). Values match chunked to f32
    rounding (tests/test_losses.py).

    chunk_size 32: neutral at the single-chip B=64 shape (652.1 vs
    650.2-651.8 for 16) and the measured winner at the DP-512 key set
    (102.69 ms composed vs 104.94 for 16, 104.18 for 8, 103.62 for 64
    — r3h sweep).

    Round 4: volume_dtype "bfloat16" — the token-sim volume rides HBM
    as bf16 between the f32-accumulated matmul and its max/clamp
    consumers (same contract as attention_scores_dtype). Measured
    +7.1 clips/s at the judged B=64 shape (653.2 vs 646.1 same-day
    baseline, r4c bench_vdt) and neutral at the DP-512 composed shape
    (647.3 vs 648.3 — there the loss already hides behind the
    encoders). Gradient equivalence pinned by
    tests/test_losses.py::TestBf16Volume."""
    return LossConfig(
        implementation="chunked_unrolled", chunk_size=32,
        matmul_precision="default", volume_dtype="bfloat16",
    )


def apply_train_knobs(model_cfg: ModelConfig, knobs) -> ModelConfig:
    """Apply the comma-separated perf A/B knob set shared by
    scripts/tpu_train_bench.py and scripts/tpu_profile_trace.py — ONE
    parser so the traced program is guaranteed to be the measured
    program (the two scripts previously carried drifting copies).

    knobs: iterable of strings or a comma-separated string. Unknown
    knob names raise (a typo must not silently profile the baseline and
    mislabel a hardware measurement).
    """
    if isinstance(knobs, str):
        knobs = [k for k in knobs.split(",") if k]
    knobs = set(knobs)
    known = {
        "perf", "tanh", "pkattn", "mqkv", "vitpk", "vitmq", "monofe",
        "posconv", "wave640", "wavext", "rematconv", "noremat",
        "mlprows2", "mlprows4", "attnpad", "pad128", "lorasep",
        "vitrows2",
    }
    unknown = knobs - known
    if unknown:
        raise ValueError(f"unknown train knobs {sorted(unknown)}")
    if "perf" in knobs:
        # Shorthand for the codified tuned set (== tanh,pkattn,vitpk,
        # monofe; pinned by tests/test_config.py).
        model_cfg = perf_train_model_config()
    if "tanh" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(model_cfg.hubert, mlp_gelu="tanh"),
            vit=dataclasses.replace(
                model_cfg.vit, mlp_impl="fused", mlp_gelu="tanh"
            ),
        )
    if "pkattn" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, attention_impl="fused_packed"
            ),
        )
    if "mqkv" in knobs:
        # Merged-qkv packed attention in HuBERT: one (C, 3C) projection
        # matmul + merged d(qkv) cotangent (one dW matmul in the bwd)
        # feeding the lane-offset kernels — supersedes pkattn when set.
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, attention_impl="fused_packed_merged"
            ),
        )
    if "vitpk" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            vit=dataclasses.replace(
                model_cfg.vit, attention_impl="fused_packed"
            ),
        )
    if "vitmq" in knobs:
        # Merged-qkv in the ViT: the fused-qkv LoRA output feeds the
        # lane-offset kernels directly (no q/k/v slices + reshapes).
        model_cfg = dataclasses.replace(
            model_cfg,
            vit=dataclasses.replace(
                model_cfg.vit, attention_impl="fused_packed_merged"
            ),
        )
    if "monofe" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, frontend_impl="monolithic",
                frontend_gelu="tanh",
            ),
        )
    if "posconv" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, posconv_impl="pallas"
            ),
        )
    if "wave640" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, frontend_wave_layout="x640"
            ),
        )
    if "wavext" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, frontend_wave_layout="xt"
            ),
        )
    # Remat-policy A/Bs: "rematconv" checkpoints the whole frontend as
    # one unit (bwd recomputes it once, unchunked); "noremat" stores
    # all frontend activations (no recompute; ~4-8 GB extra HBM at
    # B=64 — may OOM, that is the experiment).
    if "rematconv" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(model_cfg.hubert, remat="conv"),
        )
    if "noremat" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(model_cfg.hubert, remat="none"),
        )
    # Ragged-N attention (skip the HBM pad copies around the packed/
    # merged kernels — fwd AND custom-VJP bwd; +35 clips/s at eval).
    if "attnpad" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, attention_pad="none"
            ),
            vit=dataclasses.replace(model_cfg.vit, attention_pad="none"),
        )
    # Inverse A/B: force the padded adapter back on AFTER "perf" (which
    # codifies attention_pad="none") — isolates ragged-N in e2e NaN
    # forensics (r4a: both kernel sets NaN'd; ragged+live-dropout bwd
    # is the untested composition).
    if "pad128" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, attention_pad="hbm"
            ),
            vit=dataclasses.replace(model_cfg.vit, attention_pad="hbm"),
        )
    # "lorasep": peft-shaped separate LoRA compute in the ViT (no
    # per-apply merged-weight assembly; see ViTConfig.lora_compute).
    if "lorasep" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            vit=dataclasses.replace(model_cfg.vit, lora_compute="separate"),
        )
    # Fused-MLP batch-row merging (must divide B=64; numerics identical;
    # rb=4 is eval-only — the backward's VMEM caps at rb=2).
    for name, rb in (("mlprows2", 2), ("mlprows4", 4)):
        if name in knobs:
            model_cfg = dataclasses.replace(
                model_cfg,
                hubert=dataclasses.replace(
                    model_cfg.hubert, mlp_block_rows=rb
                ),
                vit=dataclasses.replace(model_cfg.vit, mlp_block_rows=rb),
            )
    # ViT-ONLY row merging: at s=261 each one-batch-row grid step
    # underfills the pipeline far more than at HuBERT's s=499 (the r5
    # train trace prices ViT MLP kernels at ~63% of floor vs ~96% for
    # HuBERT's); the earlier both-encoder rows A/Bs may have hidden a
    # ViT win behind a HuBERT loss.
    if "vitrows2" in knobs:
        model_cfg = dataclasses.replace(
            model_cfg,
            vit=dataclasses.replace(model_cfg.vit, mlp_block_rows=2),
        )
    return model_cfg
