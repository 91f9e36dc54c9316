"""Backend selection for the hot solver ops.

``SimplexOptions.backend`` picks between:
  * ``"xla"``    — pure jnp, XLA-fused (works on any JAX backend)
  * ``"pallas"`` — hand-written TPU Mosaic kernels (simplex_tpu.kernels.*)

Both expose the same five functions (see :mod:`simplex_tpu.kernels.xla`), so
the pivot step is backend-agnostic. The distributed solver passes its own
backend object whose pricing runs shard-local + one ICI collective
(:mod:`simplex_tpu.dist.sharded`).
"""

from __future__ import annotations

import types

from simplex_tpu.kernels import xla as _xla


def _xla_backend() -> types.SimpleNamespace:
    from simplex_tpu.kernels import pallas_ops as _pl

    return types.SimpleNamespace(
        name="xla",
        # the fused post-ftran kernel is a dispatch-latency optimization,
        # orthogonal to the big-op backend choice — both backends use it
        ratio_eta=_pl.ratio_eta,
        choose_entering=_xla.choose_entering,
        mask_basic=_xla.mask_basic,
        devex_choose=_xla.devex_choose,
        devex_choose_bounded=_xla.devex_choose_bounded,
        pricing_update=_xla.pricing_update,
        pricing_update2=_xla.pricing_update2,
        gather_column=_xla.gather_column,
        gather_cost=_xla.gather_cost,
        gather_basis_matrix=_xla.gather_basis_matrix,
        ratio_argmin=_xla.ratio_argmin,
        ratio_argmin_harris=_xla.ratio_argmin_harris,
        rank1_update=_xla.rank1_update,
        # bounded-variable rule ops (native upper bounds): XLA-only for now
        choose_entering_bounded=_xla.choose_entering_bounded,
        ratio_argmin_bounded=_xla.ratio_argmin_bounded,
    )


def _pallas_backend() -> types.SimpleNamespace:
    from simplex_tpu.kernels import pallas_ops as _pl

    return types.SimpleNamespace(
        name="pallas",
        ratio_eta=_pl.ratio_eta,
        choose_entering=_pl.choose_entering,
        mask_basic=_xla.mask_basic,
        devex_choose=_xla.devex_choose,
        devex_choose_bounded=_xla.devex_choose_bounded,
        pricing_update=_xla.pricing_update,
        pricing_update2=_xla.pricing_update2,
        gather_column=_xla.gather_column,
        gather_cost=_xla.gather_cost,
        gather_basis_matrix=_xla.gather_basis_matrix,
        ratio_argmin=_pl.ratio_argmin,
        ratio_argmin_harris=_xla.ratio_argmin_harris,
        rank1_update=_pl.rank1_update,
        # bounded-variable rule ops: no Pallas kernels yet (the measured
        # verdict favored XLA end-to-end anyway, pallas_ops.py:19-33)
        choose_entering_bounded=_xla.choose_entering_bounded,
        ratio_argmin_bounded=_xla.ratio_argmin_bounded,
    )


def get_backend(name: str):
    if name == "xla":
        return _xla_backend()
    if name == "pallas":
        return _pallas_backend()
    raise ValueError(f"unknown kernel backend: {name!r} (want 'xla' or 'pallas')")
