"""DGP model stack: layers, encoders, objectives, builder.

TPU-native rebuild of ref:dgps_with_iwvi/{layers,models}.py and
ref:experiments/models.py.
"""

from .builder import (BuildArgs, build_config, build_model, kmeans_centers,
                      load_build_args, parse_prior_flag, save_build_args)
from .dgp import (
    DGPConfig,
    elbo,
    gp_kls,
    init_dgp,
    predict_f,
    predict_f_full_cov,
    predict_f_samples,
    predict_log_density,
    predict_y,
    predict_y_and_log_density,
    predict_y_samples,
    propagate,
)
from .layers import GPLayerConfig, LatentVarMode, LVLayerConfig

__all__ = [
    "BuildArgs",
    "DGPConfig",
    "GPLayerConfig",
    "LVLayerConfig",
    "LatentVarMode",
    "build_config",
    "build_model",
    "load_build_args",
    "save_build_args",
    "parse_prior_flag",
    "elbo",
    "gp_kls",
    "init_dgp",
    "kmeans_centers",
    "predict_f",
    "predict_f_full_cov",
    "predict_f_samples",
    "predict_log_density",
    "predict_y",
    "predict_y_and_log_density",
    "predict_y_samples",
    "propagate",
]
