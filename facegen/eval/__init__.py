"""Evaluation subsystem: sample-quality parity statistics.

Lazy re-exports (PEP 562) so `python -m facegen.eval.parity` doesn't
double-import the submodule.
"""

_EXPORTS = (
    "d_penultimate_features",
    "frechet_distance",
    "ks_2samp",
    "min_nn_distances",
    "parity_report",
    "sample_report",
    "self_report",
    "spearman",
)


def __getattr__(name):
    if name in _EXPORTS:
        from facegen.eval import parity

        return getattr(parity, name)
    raise AttributeError(name)


__all__ = list(_EXPORTS)
