from .codec import ColorModel, make_model, model_config_from_dict
from .entropy import (
    CodecTables,
    EntropyBottleneck,
    GaussianConditional,
    MeanScaleHyperprior,
    default_scale_table,
)
from .layers import (
    ConditionEncoder,
    ConvReluConv,
    GenerativeUp,
    QPredict,
    ScaledBlock,
    UpsampleTo,
)
from .transforms import AnalysisTransform, Capacities, SparseSynthesisTransform

__all__ = [
    "AnalysisTransform",
    "Capacities",
    "CodecTables",
    "ColorModel",
    "ConditionEncoder",
    "ConvReluConv",
    "EntropyBottleneck",
    "GaussianConditional",
    "GenerativeUp",
    "MeanScaleHyperprior",
    "QPredict",
    "ScaledBlock",
    "SparseSynthesisTransform",
    "UpsampleTo",
    "default_scale_table",
    "make_model",
    "model_config_from_dict",
]
