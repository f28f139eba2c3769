"""Engine configuration — the analog of ``ZopfliOptions`` (reference:
src/zopfli/zopfli.h:33-134). A plain dataclass so it broadcasts cheaply to
executors inside pandas-UDF closures."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # --- page / partition geometry -------------------------------------
    #: target token values per page — unit of codec choice (deflate-block
    #: analog; reference src/zopfli/blocksplitter.c:354-363 simple splitting)
    page_budget_values: int = 1 << 20
    #: target token values per shuffle group — unit of independent work
    #: (master-block analog, reference src/zopfli/util.h:52-61: bounded
    #: memory per task regardless of total input size)
    group_budget_values: int = 1 << 22
    #: docs with n_tok ≥ this get routed to dedicated long-tail groups
    #: (explicit skew handling: one 10M-token doc must not serialize a task)
    giant_doc_values: int = 1 << 21

    # --- codec search ----------------------------------------------------
    #: zlib candidate level for the entropy-coded fallback codecs
    zlib_level: int = 6
    try_zlib: bool = True
    #: 'simple' = fixed-budget page boundaries; 'cost' = entropy-cost-driven
    #: greedy split search (FindMinimum analog, reference
    #: src/zopfli/blocksplitter.c:57-117); 'dp' = globally optimal under the
    #: estimate via forward DP + traceback (GetBestLengths/TraceBackwards
    #: analog, squeeze.c:255-412) — ~+1.9% ratio at ~2.4x encode CPU
    split_mode: str = "cost"
    #: max pages per group for the cost-based splitter (blocksplittingmax
    #: analog, reference src/zopfli/zopfli.h:55-60, default 15)
    max_pages_per_group: int = 64
    #: squeeze-loop iterations: perturb-and-keep-best rounds per group
    #: (reference src/zopfli/squeeze.c:511-655, numiterations default 15)
    iterations: int = 5
    #: stop after this many non-improving iterations (maxunsuccessful/--mui
    #: analog, reference src/zopfli/squeeze.c:609)
    max_unsuccessful: int = 3
    #: recompression passes (--pass analog, reference src/zopfli/deflate.c:
    #: 1728-1836): re-encode worst-ratio pages at zlib level 9, keep if smaller
    recompress_passes: int = 1
    #: mode-grid search (--all analog, reference src/zopfli/deflate.c:
    #: 1326-1342, opt-in there too): on groups whose realized cost exceeds a
    #: per-doc achievable estimate, retry alternate split strategies and
    #: keep the strictly smallest result. Measured on the synth mixture:
    #: +2.8%% ratio for ~2.4x encode CPU — the classic Zopfli trade, so the
    #: default mirrors the reference's opt-in
    mode_grid: bool = False
    #: with split hints supplied to encode_table: also run the cost splitter
    #: WITHIN each hinted segment (--aas "additional auto splitting" analog,
    #: reference src/zopfli/deflate.c:1860-1884); hinted points always survive
    hints_additional_split: bool = False
    #: deterministic seed; combined with content hashes so re-runs (and runs
    #: at different parallelism) produce byte-identical streams
    seed: int = 42

    # --- verification ----------------------------------------------------
    verify_checksums: bool = True

    @property
    def mode(self) -> int:
        """Codec-search config fingerprint for lineage keys — the mode
        dip-switch analog (reference src/zopfli/zopfli.h:100-112)."""
        bits = 0
        bits |= 1 if self.try_zlib else 0
        bits |= (self.zlib_level & 0xF) << 1
        bits |= (1 if self.split_mode == "cost" else 0) << 5
        bits |= (self.iterations & 0xFF) << 6
        bits |= (self.max_unsuccessful & 0xF) << 14
        bits |= (self.recompress_passes & 0x3) << 18
        bits |= (1 if self.mode_grid else 0) << 20
        bits |= (1 if self.split_mode == "dp" else 0) << 21
        return bits


DEFAULT_CONFIG = EngineConfig()
