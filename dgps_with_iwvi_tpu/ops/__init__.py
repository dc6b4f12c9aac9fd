"""GP math core: kernels, linalg, conditionals, KL, likelihoods, transforms.

TPU-native rebuild of the gpflow-1.5.x dependency layer the reference
(hughsalimbeni/DGPs_with_IWVI) sits on — see SURVEY.md §2.3.
"""

from . import conditionals, kernels, kl, likelihoods, linalg, mean_functions, transforms

__all__ = [
    "conditionals",
    "kernels",
    "kl",
    "likelihoods",
    "linalg",
    "mean_functions",
    "transforms",
]
