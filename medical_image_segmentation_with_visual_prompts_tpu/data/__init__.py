from .datasets import (DataLoader, Dataset, batch_size_of,
                       get_fit_loader_downstream,
                       get_fit_loader_self_supervised_learning,
                       get_fit_loader_supervised_learning,
                       get_test_loader_downstream, num_samples_of)
from .nifti import load_nifti, save_nifti
from . import transforms

__all__ = [
    "DataLoader", "Dataset", "batch_size_of", "get_fit_loader_downstream",
    "get_fit_loader_self_supervised_learning",
    "get_fit_loader_supervised_learning", "get_test_loader_downstream",
    "num_samples_of", "load_nifti", "save_nifti", "transforms",
]
