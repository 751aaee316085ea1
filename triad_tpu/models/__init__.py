from triad_tpu.models.distilbert import DistilBertModel
from triad_tpu.models.hubert import HubertModel, normalize_waveform
from triad_tpu.models.layers import LoRADense, Mlp, ProjectionHead
from triad_tpu.models.multimodal import TriadModel, init_triad_model
from triad_tpu.models.vit import DinoViT

__all__ = [
    "DinoViT",
    "DistilBertModel",
    "HubertModel",
    "LoRADense",
    "Mlp",
    "ProjectionHead",
    "TriadModel",
    "init_triad_model",
    "normalize_waveform",
]
