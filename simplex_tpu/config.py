"""Solver configuration.

The reference hard-codes its knobs as ``constexpr`` (``BS_1D/BS_2D/EPS/
MAX_ITER``, ``src/v1_baseline.cu:15-18``) and a compile-time ``#define PRINT``
(``:20``). Here every tolerance and policy is a field of a frozen (hashable)
dataclass so it can be a static argument to ``jax.jit`` — one compiled
executable per option set, zero runtime branching cost.

Notable deviations from the reference (deliberate, see SURVEY.md §7):
  * ``max_iter`` defaults to a real bound, not the debug leftover ``5``.
  * ``pivot_tol`` replaces the exact ``alpha > 0`` test of ``compute_theta``
    (``src/v1_baseline.cu:219-228``) — tiny positive pivots explode ``1/α_q``
    in fp32; the reference's README lists this as an open TODO.
  * ``refactor_every`` adds periodic re-inversion of the true basis to stop
    fp32 drift in the product-form B_inv (reference has no mitigation).
  * ``bland_after`` switches pricing to Bland's rule after that many
    consecutive degenerate pivots, guaranteeing termination (the reference
    would cycle; MAX_ITER=5 hid this).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimplexOptions:
    """Static options for the simplex solver (hashable -> jit-static)."""

    # Optimality tolerance on reduced costs; None resolves by dtype (1e-5 for
    # fp32, 1e-9 for fp64). fp32 pricing noise is ~1e-6*sqrt(m), so a tighter
    # fp32 tolerance makes the solver chase phantom negative reduced costs
    # near the optimum. Reference: flat EPS = 1e-4f (src/v1_baseline.cu:17).
    eps: Optional[float] = None

    # Ratio-test pivot tolerance: a column entry must exceed this to be an
    # eligible pivot. Reference used exact `alpha > 0`.
    pivot_tol: float = 1e-7

    # Harris ratio-test feasibility relaxation: pass 1 tolerates this much
    # primal infeasibility to let pass 2 pick a larger (more stable) pivot.
    # Consumed by every backend (single-chip, 1-D, 2-D) so the one
    # stability-critical tolerance can't silently drift apart across modes.
    # The residual O(feas_tol) infeasibility is surfaced via feas_err.
    feas_tol: float = 1e-6

    # Pivot limit. 0 means "auto": 50 * (m + n) chosen at trace time.
    max_iter: int = 0

    # Re-invert the true basis every K pivots (0 = never). Amortized O(m^3/K).
    refactor_every: int = 0

    # Recompute x_b = B_inv b and y = c_b B_inv from the CURRENT inverse
    # every K pivots (0 = never, the default): two O(m^2) matvecs, ~free
    # amortized. Bounds the incremental updates' drift (which can mislead
    # the ratio test into slightly-infeasible bases at 16k+), BUT the exact
    # refresh resurfaces the Harris tolerance's tiny-negative x_b entries
    # every interval, which measured 3x+ MORE pivots on a 16k devex solve
    # (degenerate churn). Off by default; consider 256-1024 with
    # ratio="classic" workloads if final feas_err matters more than pivots.
    recompute_every: int = 0

    # Never accept a terminal status (optimal/unbounded/singular) computed
    # from a stale product-form inverse: refactorize and re-check first.
    # Guarantees the reported optimum is exact for the final basis and that
    # termination used exact reduced costs — one extra O(m^3) at the end.
    # (fp32 drift otherwise shows up as ~1e-5 objective error; observed.)
    verify_terminal: bool = True

    # After this many consecutive degenerate pivots (theta ~ 0), switch the
    # pricing rule to Bland's (smallest eligible index) until progress
    # resumes. 0 disables the fallback.
    bland_after: int = 64

    # Degenerate-step threshold on theta.
    degen_tol: float = 1e-9

    # Anti-degeneracy RHS perturbation (the production-solver cure for
    # degenerate stalling — HiGHS/CPLEX perturb costs/bounds the same way;
    # Bland's rule is a termination PROOF, not a numerical strategy). After
    # this many consecutive degenerate pivots, shift every basic value by a
    # tiny deterministic positive amount delta and fold w = B @ delta into
    # the rhs the solver tracks (x_b solves B x = b_eff + w EXACTLY, so
    # refactorization / recompute reproduce the perturbed point instead of
    # silently undoing it). Every subsequent ratio test then has strictly
    # positive numerators -> every pivot makes real progress and the stall
    # breaks. The shift is removed at the first terminal decision (a
    # verify_terminal round clears it, refactorizes against the TRUE rhs,
    # and re-runs), so certified answers never see the perturbation.
    # Re-arms on every further perturb_after-long streak (accumulating w, up
    # to 16 activations). Fires before bland_after (Bland stays as the
    # last-resort exact rule). Exercised by genuinely-degenerate instances
    # (oracle/generator.degenerate_streak_lp: 4-8-long zero-theta streaks;
    # tests/test_perturb.py pins activation, terminal clearing, and oracle
    # parity). NOTE: an 8192x16384 multi_price stall first motivated this
    # knob, but that stall's root cause turned out to be the unpinned bf16
    # refill GEMM (see core/step._multi_pricing) — with that fixed the
    # benchmark LP terminates with ZERO activations; the perturbation
    # remains as the standard production guard for genuinely degenerate
    # workloads (assignment/transportation-structured bases). 0 disables.
    perturb_after: int = 48

    # Relative magnitude of the shift: delta_i = perturb_scale *
    # (1 + |x_b_i|) * r_i with deterministic low-discrepancy r_i in
    # [0.5, 1.5]. Bounded solves aim each row's shift into the interior
    # (away from its nearer bound) and cap it at a quarter of the room so
    # a perturbed point never crosses a bound.
    perturb_scale: float = 1e-4

    # Geometric escalation of the shift across re-arms: activation k uses
    # perturb_scale * perturb_grow^min(k, 4). A re-arm means the PREVIOUS
    # shift failed to break the stall — the assignment/transportation-class
    # extreme (bench --degen) exhausted all 16 activations at the fixed
    # base scale with a live 736-long degenerate streak at the 8192-pivot
    # budget; with escalation the same budget ends with streak 0 after 6
    # activations at 23% less wall (scripts/r5_esc_degen.py, v5e). The
    # exact-accounting invariant (B x = b_eff + w) holds at any magnitude —
    # the shift is fully cleared before certification either way — but the
    # exponent cap must stay SMALL: delta scales with (1 + |x_b|) and |x_b|
    # carries the accumulated shift, so large escalations feed back
    # (measured at cap 2^10: |x_b| grew to O(100) by 49k pivots on the
    # degenerate extreme). 2^4 = 16x base splits tie structure well beyond
    # fp32 noise while the total shift stays O(1e-2)-relative. 1.0
    # restores the fixed-scale behavior.
    perturb_grow: float = 2.0

    # Core arithmetic dtype for A / B_inv / vectors.
    dtype: jnp.dtype = jnp.float32

    # Kernel backend for the hot ops: "xla" (pure jnp, let XLA fuse) or
    # "pallas" (hand-written TPU kernels in simplex_tpu.kernels).
    backend: str = "xla"

    # Pricing rule:
    #   "dantzig" — classic: recompute e = y.A - c each pivot, most-negative
    #               entering (the reference's rule, src/v4_cub_reduction.cu:289-302)
    #   "devex"   — incremental reduced costs (e updated by one rho.A pass per
    #               pivot — same HBM traffic as Dantzig's pricing pass) with
    #               Devex reference weights; typically far fewer pivots.
    #               Termination is still exact: an O(mn) recompute verifies
    #               optimality whenever the incremental test fires.
    #   "steepest" — EXACT steepest edge (Goldfarb-Reid): the true norms
    #               gamma_j = 1 + ||B_inv A_j||^2 maintained exactly at one
    #               extra O(m^2) GEMV per pivot; the two O(mn) row passes
    #               (w = rho.A and v = u.A) are fused into ONE (2, m) x
    #               (m, n) GEMM so A streams from HBM once (kernels.xla.
    #               pricing_update2). Composes with update_defer (the u /
    #               binv_q corrections telescope over the pending pairs);
    #               single-chip, no multi_price (its buffered minor pivots
    #               skip the per-pivot w/v passes the recurrence needs).
    #               (The reference left steepest-edge unchecked, README.md:21.)
    pricing: str = "dantzig"

    # Pricing-pass precision: "float32" (exact, the default) or "bfloat16".
    # bfloat16 halves the dominant HBM read of every pivot (the O(mn) pass
    # over A) by pricing against a bf16 shadow copy with f32 accumulation.
    # Correctness is unchanged: the chosen candidate's reduced cost is
    # re-verified against fp32 A (O(m)), and if it is not truly improving —
    # or Bland's anti-cycling rule is active — the pivot falls back to one
    # exact fp32 pricing pass, so termination decisions are always exact.
    pricing_dtype: str = "float32"

    # Ratio test: "harris" (default; two-pass stabilized: relax feasibility
    # by ~1e-6, then pick the largest pivot magnitude among near-tying rows)
    # or "classic" (exact smallest ratio, the reference's rule). Harris
    # bounds 1/alpha_q, preventing fp32 inverse blow-ups from tiny pivots —
    # the failure mode behind the reference's open division-by-small-pivot
    # TODO (README.md:29); at 8k x 16k fp32 the classic rule diverges to
    # SINGULAR/NaN (observed on v5e), Harris converges to the exact optimum.
    ratio: str = "harris"

    # Defer B_inv product-form updates: instead of one O(m^2) read+write of
    # B_inv per pivot (the reference's cublasSger), keep up to L pending
    # (eta, row) pairs and apply them as ONE rank-L GEMM every L pivots.
    # Exactness is preserved by telescoping: B_k = B_0 + sum_j eta_j (x) r_j
    # where r_j is row q_j of the true inverse at pivot j, reconstructed from
    # the base matrix plus earlier pending pairs in O(L m). Cuts per-pivot
    # B_inv update traffic from m^2 r+w to m^2/L amortized (the ftran read of
    # the base matrix remains). 0 disables (eager rank-1 update).
    update_defer: int = 0

    # Partial (segmented) pricing for the Dantzig rule: price only segment
    # (iters mod S) of the columns each pivot — 1/S of the dominant HBM
    # read. The segment winner's reduced cost is re-verified exactly; if the
    # segment has no improving column (or Bland is active), that pivot falls
    # back to one full exact pass, so termination stays exact. S=0/1
    # disables. Classic tradeoff: cheaper pivots, usually more of them —
    # measure time-to-optimal, not just pivots/sec. n must divide by S.
    partial_pricing: int = 0

    # Segmented pricing only activates when each segment has at least this
    # many columns: tiny segments were measured 2.5x SLOWER than full pricing
    # (the exact-recheck / dry-segment fallbacks dominate). Lower it in tests
    # to exercise the segmented path on small LPs.
    partial_min_segment: int = 512

    # Multiple pricing (classic suboptimization, Orchard-Hays). Pick the
    # K most-improving columns in ONE pricing pass, ftran them all in ONE
    # (m, m) x (m, K) GEMM — the per-pivot m^2 fp32 read of the base inverse
    # (the measured per-pivot floor, docs/TUNING.md) amortizes over up to K
    # pivots — then run minor pivots among the candidates, updating their
    # tableau columns EXACTLY at O(K m) per pivot via the product form
    #   alpha_j' = alpha_j + alpha_j[q] * eta,   e_j' = e_j - e_p/a_q * alpha_j[q].
    # When no candidate improves (or Bland's rule is active), the buffer
    # refills from a fresh pricing pass, so termination is still decided by
    # an exact full pass. Dantzig only (ignored under devex). COMPOSES with
    # partial_pricing (dense A + pricing shadow only): refill r then prices
    # just column segment (r mod S) — the rotation that gives segmented
    # Dantzig its short pivot paths — with the usual dry-segment fallback
    # chain (full shadow -> exact pass). Measured (v5e, 8192x16384): FULL-
    # pass refills follow the plain-Dantzig path (~21k pivots vs segmented
    # ~4.6k) and collapse to ~146 pivots/s near the optimum; segmented
    # refills + approx_max_k candidate selection fix both. 0 disables.
    multi_price: int = 0

    # Suboptimization staleness cutoff: refill when the best remaining
    # candidate's improvement drops below this fraction of the best at
    # refill time. Without it, the minor loop keeps pivoting on barely-
    # improving leftovers and zigzags: MEASURED at 8192x16384 fp32, K=16
    # ran >30,000 pivots without terminating (z=0.73 vs optimum from 4,571
    # flagship pivots) at 145 pivots/s sustained, while the same run with
    # the 0.05 cutoff terminates. 0 restores the pure "any improving
    # candidate" rule.
    multi_price_stale: float = 0.05

    # Degenerate-streak length that forces a candidate refill under multiple
    # pricing. Minor pivots on a fixed buffer are the classic suboptimization
    # cycling hazard (measured at 2048x4096 fp32: a permanently-degenerate
    # regime near the optimum latched Bland on and the exact-min-ratio Bland
    # pivots destroyed the basis conditioning — z oscillating +-30, MAX_ITER
    # at 307k pivots); refilling restores the eager pivot choice. But a
    # threshold of 1 (refill on ANY zero-theta pivot — round 4's rule) forces
    # the full O(mn) repricing + O(m^2 K) ftran on EVERY pivot of a
    # degenerate stretch, erasing the amortization on assignment/
    # transportation-structured LPs that are degenerate but progressing.
    # A short streak budget keeps the buffer through isolated ties while
    # still breaking sustained stalls well before perturb_after/bland_after.
    multi_price_degen: int = 4

    # Price against a BLOCK-SPARSE shadow of A (simplex_tpu.sparse): the
    # dominant O(mn) pricing read touches only the tiles containing
    # nonzeros — on netlib-class instances (>99% sparse) this multiplies
    # with pricing_dtype="bfloat16" (bf16 tiles, f32 accumulation). The
    # exact-recheck contract is unchanged: the shadow winner's reduced cost
    # is re-verified against dense fp32 A, and termination always comes
    # from an exact pass. Ignored under devex/steepest (no shadow there);
    # incompatible with partial_pricing (segments need sliceable arrays)
    # and the pallas backend. Dense A stays resident for column gathers,
    # so this trades memory for pricing traffic.
    pricing_sparse: bool = False

    # Two-stage fallback for segmented pricing: when a segment is dry, retry
    # over the FULL bf16 shadow (1/16th the bytes of exact pricing) before
    # paying the exact f32 pass. Termination is still decided from exact
    # values either way. Compile cost measured negligible (7-11s either way
    # at 1024x2048 on v5e), so on by default.
    fallback_shadow: bool = True

    # Dual simplex (core/dual.py): bound-flipping ratio test (BFRT /
    # "long step"). When the dual step passes the breakpoint of a FINITE-
    # bound column, that column flips to its other bound instead of
    # entering, and the walk continues while the dual objective still
    # improves (slope |delta_r| minus the passed u_j |g_j| weights stays
    # positive) — one pivot absorbs many bound flips, the classic win on
    # bound-heavy (netlib-class) instances. Costs one n-sort per pivot and
    # one O(mn)+O(m^2) matvec when flips actually happen; unbounded-column
    # problems never flip (the test reduces to the classic rule exactly),
    # and Bland anti-cycling mode disables it. False = single-break test.
    dual_flip: bool = True

    # Checkpoint the solver state every K pivots into a host-side store
    # (0 = never). Used by simplex_tpu.core.checkpoint.
    checkpoint_every: int = 0

    # Recompute x_b and z in float64 on the host from the final basis
    # (exact objective for the returned basis). Applied when m <=
    # polish_max_m; O(m^3) host numpy, so the cutoff bounds the hidden
    # host tail (a 16k f64 solve is already seconds of single-core time).
    polish: bool = True
    polish_max_m: int = 16384

    def resolve_max_iter(self, m: int, n: int) -> int:
        return self.max_iter if self.max_iter > 0 else 50 * (m + n)

    def resolve_eps(self) -> float:
        if self.eps is not None:
            return self.eps
        return 1e-9 if jnp.dtype(self.dtype).itemsize >= 8 else 1e-5

    def resolve_defer(self) -> int:
        """Effective deferred-update buffer length L.

        Multiple pricing REQUIRES the frozen-base representation: the base
        inverse must not change except at a flushing refill, so the stored
        BASE ftran columns stay exactly reconstructible
        (alpha = alpha0 + U.T(R A_p), see core/step._multi_pricing).
        Pending pairs are flushed only when the buffer fills (the
        npend >= L refill trigger), and at most one pair is appended per
        pivot — so L bounds the pending count and the buffer can never
        overflow even when ``update_defer`` itself is 0."""
        if self.multi_price > 0:
            return max(self.update_defer, self.multi_price)
        return self.update_defer


DEFAULT_OPTIONS = SimplexOptions()
