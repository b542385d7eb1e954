"""Roofline / MFU accounting for the query engines.

VERDICT r2 #3: no artifact reported FLOPs, bytes, or utilization, so the
perf claims were unquantified against the hardware.  This module gives
each engine an analytic FLOP + HBM-byte model, combines it with a
measured batch latency, and states whether the engine is MXU- or
HBM-bound and what fraction of the v5e roofline it achieves.

Peak numbers (TPU v5e, one chip):
  * MXU: 197 TFLOP/s bf16, ~98 TFLOP/s f32 (bf16 passes with f32
    accumulation at HIGHEST precision cost ~2x).
  * HBM: 819 GB/s.

The bound for a kernel with F flops and Q bytes is
  t >= max(F / peak_flops, Q / peak_bw)
and the reported utilization is measured-time / that bound (1.0 = at the
roofline).  Arithmetic intensity F/Q against the ridge point
(peak_flops / peak_bw ~ 120-240 flop/byte) names the bound.
"""

from __future__ import annotations

from typing import NamedTuple

V5E_PEAK_BF16 = 197e12   # FLOP/s
V5E_PEAK_F32 = 98e12     # FLOP/s (HIGHEST-precision passes)
V5E_HBM_BW = 819e9       # bytes/s
# Measured device row-gather cost (scripts/gather_probe.py, 1M-row
# corpus, B=1024 x C=512 distinct-index dispatches): 35-37M rows/s at
# D=128 and 23-25M rows/s at D=768 — far below the byte roofline, so a
# gather-stage bound must use the measured rate or every gather-bearing
# path reads as "inefficient" against an unreachable bound.  Two-point
# fit: t_row ~ 25 ns fixed + row_bytes / 170 GB/s.  (The r3 constant was
# a single 21M rows/s point; a Pallas manual-DMA gather was prototyped
# to beat this but the remote compile service's Mosaic backend rejects
# manual-DMA kernels outright — HTTP 500 on every variant — so the XLA
# gather rate stands as the device bound for now.)
GATHER_ROW_OVERHEAD_S = 25e-9
GATHER_BW = 170e9
V5E_GATHER_ROWS_PER_S = 21e6   # legacy single-point constant (kept for
#                                width-unknown callers)
# Candidate-pool selection: every pool path must READ its (B, S) score
# matrix a second time and run a selection network over it.  The round-4
# composite omitted that read entirely (it max()'d into the sweep's HBM
# term), which is most of why recorded runs sat at 0.41-0.58 of the old
# bound.  Round 5 charges it as its own sequential stage at full HBM
# bandwidth — a true LOWER bound.  The measured approx_max_k pass also
# carries a selection overhead BEYOND the read that scales with B x k
# (pipeline_probe r5: ~23 ms beyond the 5.3 ms read at B=k=1024 over
# 1.05M columns, i.e. ~22 ns per row-candidate; the 4M rows at B=k=512
# measure a ~4x smaller overhead, consistent with that scaling) — that
# overhead is documented here, not charged, so the bound never exceeds a
# well-measured run.  Measured alternatives lost: the strided two-level
# max reduction (index.grouped_pool_topk) lowered 1.5x slower end-to-end
# despite better pool quality (130.5 vs 84.8 ms/batch;
# overlap-vs-exact-pool 0.933 vs 0.842), and exact lax.top_k is the r3
# "5x the matmuls" cliff.
APPROX_TOPK_ROWK_OVERHEAD_S = 22e-9   # measured, documentation constant


def gather_time_s(rows: float, row_bytes: float) -> float:
    return rows * (GATHER_ROW_OVERHEAD_S + row_bytes / GATHER_BW)


class EngineModel(NamedTuple):
    """Analytic per-BATCH cost model of one engine invocation."""

    name: str
    flops: float          # total FLOPs for the batch
    hbm_bytes: float      # total HBM traffic for the batch
    f32_mxu: bool = True  # True when the GEMMs run at HIGHEST (f32) prec.
    gather_rows: float = 0.0  # row-gather count (row-rate-limited stage)
    # SEQUENTIAL multi-stage paths set these: stage minima SUM (one core
    # runs the stages back to back — max() composition would pretend the
    # gather overlaps the sweep) and the dominant stage names the bound
    min_time_override_s: float = 0.0
    bound_override: str = ""

    @property
    def intensity(self) -> float:
        return self.flops / max(self.hbm_bytes, 1.0)

    def bound(self) -> str:
        if self.bound_override:
            return self.bound_override
        peak = V5E_PEAK_F32 if self.f32_mxu else V5E_PEAK_BF16
        g = self.gather_rows / V5E_GATHER_ROWS_PER_S
        if g >= max(self.flops / peak, self.hbm_bytes / V5E_HBM_BW):
            return "GATHER"
        ridge = peak / V5E_HBM_BW
        return "MXU" if self.intensity >= ridge else "HBM"

    def min_time_s(self) -> float:
        if self.min_time_override_s > 0:
            return self.min_time_override_s
        peak = V5E_PEAK_F32 if self.f32_mxu else V5E_PEAK_BF16
        return max(self.flops / peak, self.hbm_bytes / V5E_HBM_BW,
                   self.gather_rows / V5E_GATHER_ROWS_PER_S)

    def report(self, measured_s: float, batch: int) -> dict:
        peak = V5E_PEAK_F32 if self.f32_mxu else V5E_PEAK_BF16
        t = max(measured_s, 1e-12)
        return {
            "engine": self.name,
            "batch": batch,
            "gflops_per_query": round(self.flops / max(batch, 1) / 1e9, 3),
            "achieved_tflops": round(self.flops / t / 1e12, 3),
            "achieved_gbps": round(self.hbm_bytes / t / 1e9, 1),
            "mfu_pct": round(100.0 * self.flops / t / peak, 2),
            "hbm_pct": round(100.0 * self.hbm_bytes / t / V5E_HBM_BW, 1),
            "bound": self.bound(),
            "roofline_min_ms": round(1e3 * self.min_time_s(), 4),
            "measured_ms": round(1e3 * measured_s, 4),
            "roofline_frac": round(self.min_time_s() / t, 3),
            "intensity_flop_per_byte": round(self.intensity, 1),
        }


def exact_flat_model(B: int, S: int, D: int,
                     dtype_bytes: int = 4) -> EngineModel:
    """One (B, D) x (D, S) GEMM + top-k.  HBM: the corpus matrix once per
    batch (queries/outputs are noise), scores written+read for top_k."""
    flops = 2.0 * B * S * D
    hbm = S * D * dtype_bytes + 2.0 * B * S * 4
    return EngineModel("exact_flat", flops, hbm, f32_mxu=dtype_bytes == 4)


def blocked_model(B: int, NB: int, M: int, TS: int, D: int,
                  dtype_bytes: int = 4, fused: bool = False) -> EngineModel:
    """Blocked Cobweb sweep: per block two (B, D)x(D, M) GEMMs + one
    (B, M)x(M, TS) path matmul.  HBM: the replicated block stats + W once
    per batch; the XLA (non-fused) variant also writes the (B, NB, TS)
    score tensor and reads it back for lax.top_k — the traffic the Pallas
    kernel (``fused=True``) eliminates by extracting candidates in VMEM."""
    flops = NB * (4.0 * B * M * D + 2.0 * B * M * TS)
    hbm = NB * (2.0 * M * D + M * TS) * dtype_bytes
    if not fused:
        hbm += 2.0 * B * NB * TS * 4
    name = "pallas_fused" if fused else "xla_blocked"
    return EngineModel(name, flops, hbm, f32_mxu=dtype_bytes == 4)


def fused_flat_model(B: int, Sp: int, D: int,
                     dtype_bytes: int = 4) -> EngineModel:
    """Fused Cobweb sweep (core/index.fused_scores): one (B, 2D) x (2D, Sp)
    GEMM + bias + top-k.  Same shape as the exact flat baseline at twice
    the contraction dim — the path-score contraction pre-associated into
    the index.  HBM: the (2D, Sp) coefficient matrix once per batch plus
    the (B, Sp) scores written and read back for top_k."""
    flops = 2.0 * B * Sp * 2 * D
    hbm = 2.0 * D * Sp * dtype_bytes + 2.0 * B * Sp * 4
    return EngineModel("fused_flat", flops, hbm, f32_mxu=dtype_bytes == 4)


def model_for_fused_index(fidx, B: int) -> EngineModel:
    TwoD, Sp = fidx.GT.shape
    return fused_flat_model(B, Sp, TwoD // 2,
                            dtype_bytes=fidx.GT.dtype.itemsize)


def product_path_model(B: int, Sp: int, D_tree: int, C: int, D_store: int,
                       gt_dtype_bytes: int = 2, d_raw: int = 0,
                       backstop: int = 0) -> EngineModel:
    """End-to-end served path (``CobwebIndex.query_ids``): optional whiten
    GEMM -> fused sweep -> [optional whitened-L2 backstop pool] -> exact
    stored-embedding re-rank of C candidates.

    The path's stages run SEQUENTIALLY on the one core, so the composite
    bound is the SUM of per-stage minima (a max() composition would
    pretend the re-rank gather overlaps the sweep); the gather stage uses
    the measured per-row cost (``gather_time_s``).  Modeling the full
    path instead of the sweep alone is what makes the e2e roofline
    fraction meaningful (VERDICT r3 #6)."""
    stage_times = {}
    # fused sweep (+ whiten folded in — it is negligible next to it).
    # Scores are charged ONCE here (the GEMM's write); their read happens
    # inside the measured-rate selection pass below.
    sweep_flops = 2.0 * B * Sp * 2 * D_tree
    sweep_hbm = 2.0 * D_tree * Sp * gt_dtype_bytes + B * Sp * 4
    flops, hbm = sweep_flops, sweep_hbm
    if d_raw:
        flops += 2.0 * B * d_raw * D_tree
        hbm += d_raw * D_tree * 4 + B * (d_raw + D_tree) * 4
    stage_times["HBM"] = max(flops / V5E_PEAK_F32, hbm / V5E_HBM_BW)
    # candidate-pool selection: the second pass over the (B, Sp) scores,
    # charged at full HBM bandwidth (round-5 refinement — a lower bound;
    # the measured B x k selection overhead on top of the read is
    # documented at APPROX_TOPK_ROWK_OVERHEAD_S, not charged)
    stage_times["POOL"] = B * Sp * 4 / V5E_HBM_BW
    hbm += B * Sp * 4
    # backstop pool: one (B, D_tree) x (D_tree, Sp) GEMM + its own
    # score write + selection read
    if backstop:
        bs_flops = 2.0 * B * Sp * D_tree
        bs_hbm = D_tree * Sp * 2 + B * Sp * 4
        flops += bs_flops
        hbm += bs_hbm + B * Sp * 4
        stage_times["BACKSTOP"] = max(
            bs_flops / V5E_PEAK_F32, bs_hbm / V5E_HBM_BW
        ) + B * Sp * 4 / V5E_HBM_BW
    # exact re-rank: gather `pool` stored rows per query + distance + topk
    pool = C + (backstop or 0)
    rr_flops = 3.0 * B * pool * D_store
    rr_hbm = B * pool * D_store * 4
    flops += rr_flops
    hbm += rr_hbm
    stage_times["GATHER"] = max(rr_flops / V5E_PEAK_F32,
                                gather_time_s(B * pool, D_store * 4))
    min_t = sum(stage_times.values())
    dominant = max(stage_times, key=stage_times.get)
    return EngineModel("product_path", flops, hbm, f32_mxu=True,
                       gather_rows=float(B * pool),
                       min_time_override_s=min_t,
                       bound_override=dominant)


def gather_path_model(B: int, S: int, N: int, D: int, P: int) -> EngineModel:
    """Gather-path scoring (core/index.query_topk): two (B, D)x(D, N)
    GEMMs + P gathers of (B, S) from the (B, N) node log-probs."""
    flops = 4.0 * B * N * D + 2.0 * B * S * P
    hbm = 2.0 * N * D * 4 + P * (B * S * 4 + S * 8) + 2.0 * B * S * 4
    return EngineModel("gather_path", flops, hbm)


def beam_model(B: int, depth: int, W: int, F: int, D: int) -> EngineModel:
    """Beam search: per level, (B, W*F) candidate log-probs via gathered
    stats (elementwise, not GEMM) + top-k.  HBM is the gather traffic —
    2 stat rows per (query, candidate)."""
    cand = B * W * F
    flops = depth * cand * 4.0 * D
    hbm = depth * cand * (2.0 * D * 4 + 8)
    return EngineModel("beam", flops, hbm)


def beam_pack_model(B: int, depth: int, C: int, D: int,
                    pack_bytes: int = 4) -> EngineModel:
    """Packed beam (core/index.beam_pack_topk): per level ONE gather of
    (B, C) interleaved (2D,) stat rows + a batched (B, C, 2D) dot.  HBM
    is the packed-row gather traffic; candidate budget C replaces W*F."""
    cand = B * C
    flops = depth * cand * 4.0 * D
    hbm = depth * cand * (2.0 * D * pack_bytes + 8)
    return EngineModel("beam_pack", flops, hbm)


def leaf_rerank_model(B: int, C: int, D: int) -> EngineModel:
    """Leaf-lp re-rank of C candidates/query: gathered stats + elementwise."""
    flops = B * C * 4.0 * D
    hbm = B * C * (2.0 * D * 4 + 8)
    return EngineModel("leaf_rerank", flops, hbm)


def model_for_blocked_index(bidx, B: int, fused: bool) -> EngineModel:
    NB, M, D = bidx.ivt_b.shape
    TS = bidx.W.shape[2]
    return blocked_model(B, NB, M, TS, D,
                         dtype_bytes=bidx.ivt_b.dtype.itemsize,
                         fused=fused)
