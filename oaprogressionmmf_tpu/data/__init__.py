"""Data layer — lazy exports.

Lazy because host-side CLI apps (targets/prep) import submodules that do
not need jax; eagerly importing the dataset/pipeline would pull in jax and
pay the TPU-tunnel initialization cost for pure-pandas work.
"""

_EXPORTS = {
    "index_from_path_oai": "index", "MODALS": "index", "VARS_DTYPES": "index",
    "DatasetOAI3d": "dataset",
    "sources_from_path": "provider", "prepare_datasets": "provider",
    "BatchLoader": "pipeline", "WeightedSampler": "pipeline",
    "SequentialSampler": "pipeline",
    "fit_t2_map": "t2_mapping",
    "derive_progression_labels": "targets", "crit_prog_kl_from_to": "targets",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)
