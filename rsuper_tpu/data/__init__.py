from .nifti import NiftiImage, read_nifti, write_nifti
from .preprocess import preprocess_case, clip_and_normalize, resample_to_spacing
from .reports import load_reports, clean_reports, case_supervision, estimate_tumor_volumes

__all__ = [
    "NiftiImage",
    "read_nifti",
    "write_nifti",
    "preprocess_case",
    "clip_and_normalize",
    "resample_to_spacing",
    "load_reports",
    "clean_reports",
    "case_supervision",
    "estimate_tumor_volumes",
]
