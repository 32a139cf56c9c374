"""Model families: the reference's L3/L4 integration patterns, TPU-first."""

from .layers import LinearParams, dropout, init_linear, linear, mlp_encoder
from .medical import MedicalDiagnosisModel, MedicalDiagnosisParams
from .multiscale import MultiScaleFusion, MultiScaleFusionParams
from .vision_language import VisionLanguageModel, VisionLanguageParams
from .xray import (
    PRESENCE_EPS,
    XrayAECFModel,
    XrayAECFParams,
    XrayBaselineModel,
    XrayBaselineParams,
)

__all__ = [
    "LinearParams",
    "dropout",
    "init_linear",
    "linear",
    "mlp_encoder",
    "MedicalDiagnosisModel",
    "MedicalDiagnosisParams",
    "MultiScaleFusion",
    "MultiScaleFusionParams",
    "VisionLanguageModel",
    "VisionLanguageParams",
    "PRESENCE_EPS",
    "XrayAECFModel",
    "XrayAECFParams",
    "XrayBaselineModel",
    "XrayBaselineParams",
]
