from .index import MODALS, VARS_DTYPES, index_from_path_oai
from .dataset import DatasetOAI3d
from .provider import prepare_datasets, sources_from_path
from .pipeline import BatchLoader, WeightedSampler
from .t2_mapping import fit_t2_map

__all__ = [
    "index_from_path_oai", "MODALS", "VARS_DTYPES", "DatasetOAI3d",
    "sources_from_path", "prepare_datasets", "BatchLoader",
    "WeightedSampler", "fit_t2_map",
]
