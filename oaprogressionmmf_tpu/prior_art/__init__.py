from .tiulpin2019 import build_clinical, build_img_progression_meta

__all__ = ["build_img_progression_meta", "build_clinical"]
