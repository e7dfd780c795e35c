"""Configuration system — the TPU-native analog of NeuronDB's GUC layer.

The reference exposes ~45 ``neurondb.*`` GUCs consolidated in a
``NeuronDBConfig`` struct (reference: NeuronDB/src/util/neurondb_guc.c:161-716,
include/neurondb_guc.h:110-141) plus SQL SHOW/SET/RESET views
(src/util/config.c). Here the same knobs are a frozen-by-convention
dataclass with a process-global instance, dotted-name get/set/reset
("neurondb.hnsw_ef_search" style), and environment-variable overrides
(NEURONDB_TPU_<UPPER_SNAKE>).
"""

from __future__ import annotations

import dataclasses
import os
import threading
from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional


@dataclass
class NDBConfig:
    """All runtime knobs. Field names mirror the reference GUC names
    (minus the ``neurondb.`` prefix) where a counterpart exists."""

    # ---- index / ANN knobs (neurondb_guc.c: hnsw_*, ivf_*) ----
    hnsw_m: int = 16                      # hnsw_am.c:81 default m
    hnsw_ef_construction: int = 200       # hnsw_am.c:82
    hnsw_ef_search: int = 64              # hnsw_am.c:83
    hnsw_ml: float = 0.36                 # hnsw_am.c:84 level multiplier
    hnsw_max_level: int = 16              # hnsw_am.c:85
    hnsw_k: int = 10                      # GUC neurondb.hnsw_k
    hnsw_build_wave: int = 1024           # TPU-only: batched insertion wave size
    # upper-level bulk-build kNN recall target (lax.approx_min_k;
    # 1.0 = exact lax.top_k). Upper graphs are heuristic routing
    # structures, so the default trades 1% pool recall for the 5.3x
    # PartialReduce speedup; set 1.0 for a deterministic exact build.
    hnsw_build_rt: float = 0.99
    ivf_nlists: int = 100                 # ivf_am.c:54
    ivf_nprobe: int = 10                  # ivf_am.c:55
    ivf_kmeans_iters: int = 50            # ivf_am.c:56
    ivf_kmeans_tol: float = 1e-3          # ivf_am.c:57
    ivf_sample_cap: int = 10000           # ivf_am.c:580 sampling rule floor
    ivf_qt: int = 0                       # grouped-scan queries/tile (0=auto)
    # IVF coarse-stage probe selection via lax.approx_min_k with this
    # recall target (1.0 = exact lax.top_k). Probes are heuristic
    # routing — end-to-end recall is what matters — and exact top_k at
    # [B, nlists] measured 1/3 of the whole search wall, so the default
    # is approximate. Set 1.0 to restore bit-exact probe selection.
    ivf_coarse_rt: float = 0.99
    # grouped-kernel top-k extraction: "packed" packs (distance,
    # position) into one int32 key (~2.5x fewer VPU passes; rounds
    # distances by <= 2**(pos_bits-24) relative and may swap near-ties
    # at the k boundary); "blockmin" additionally folds each segment's
    # keys into 128 lane-class minima before the kp selection rounds
    # (at most ONE candidate per (query, segment, lane-class) — a
    # further ~4x selection-pass cut; end-to-end recall re-measured by
    # bench.py through this path); "exact" keeps the argmin extraction.
    ivf_select: str = "packed"
    # BM25 device batch scorer for non-heavy terms: "tiled" scores
    # doc-tiled postings via segment-summed one-hot GEMMs on the MXU
    # (exact — no posting truncation), "scatter" keeps the
    # term-at-a-time scatter-add tiers (seg_cap-truncated; the pre-r5
    # path, ~18M updates/s on the scalar core).
    bm25_scorer: str = "tiled"

    # ---- compute-mode (gpu_* GUCs -> TPU equivalents) ----
    compute_mode: str = "auto"            # cpu | tpu | auto (gpu compute_mode GUC)
    use_pallas: bool = True               # use fused Pallas kernels when on TPU
    batch_size: int = 1024                # gpu_batch_size analog: query batch
    scan_chunk: int = 65536               # N-dimension chunk for flat scans
    distance_dtype: str = "float32"       # accumulation dtype
    store_dtype: str = "auto"             # auto = bf16 on TPU, f32 elsewhere
    topk_recall_target: float = 1.0       # approx_min_k recall target (1.0 = exact)

    # ---- LLM / embedding gateway (llm_* GUCs, neurondb_llm.h:15-119) ----
    llm_provider: str = "local"           # local | http | openai | stub
    llm_model: str = ""
    llm_endpoint: str = ""
    llm_api_key: str = ""
    llm_timeout_ms: int = 30000
    llm_cache_ttl_s: int = 300            # llm_cache.c TTL GUC
    llm_rate_limit_qps: float = 0.0       # 0 = unlimited
    llm_fail_open: bool = True            # llm_router.c:66-95 fail-open semantics

    # ---- workers (neuranq_*/neuranmon_*/neurandefrag_* GUCs) ----
    worker_queue_poll_ms: int = 100       # neuranq poll interval
    worker_queue_retry_max: int = 3       # worker retry limit (worker_llm.c:5-8)
    tuner_enable: bool = False            # neuranmon auto-tuner
    tuner_target_recall: float = 0.95     # worker_tuner.c SLO
    tuner_target_latency_ms: float = 50.0
    tuner_ef_min: int = 16                # worker_tuner.c:326-342 envelope
    tuner_ef_max: int = 512
    defrag_enable: bool = False           # neurandefrag compaction
    defrag_tombstone_ratio: float = 0.2   # compact when deleted fraction exceeds

    # ---- metrics / observability ----
    metrics_enable: bool = True
    prometheus_port: int = 9187           # prometheus.c:50 GUC default

    # ---- quotas / tenancy (scan_quota.c, multi_tenant.c) ----
    quota_max_vectors: int = 0            # 0 = unlimited
    quota_max_qps: float = 0.0
    quota_max_bytes: int = 0

    # ---- misc ----
    seed: int = 0
    max_dim: int = 16000                  # neurondb.h:113 vector dim limit
    validate_inputs: bool = True

    def show(self, name: str) -> Any:
        """SHOW neurondb.<name> (src/util/config.c analog)."""
        return getattr(self, _norm(name))

    def set(self, name: str, value: Any) -> None:
        key = _norm(name)
        cur = getattr(self, key)  # raises AttributeError for unknown GUC
        if cur is not None and value is not None and not isinstance(value, type(cur)):
            value = type(cur)(value)
        setattr(self, key, value)

    def reset(self, name: str) -> None:
        key = _norm(name)
        default = _DEFAULTS[key]
        setattr(self, key, default)

    def as_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _norm(name: str) -> str:
    name = name.strip()
    for prefix in ("neurondb_tpu.", "neurondb.", "ndb."):
        if name.startswith(prefix):
            name = name[len(prefix):]
    return name


_DEFAULTS = {f.name: f.default for f in fields(NDBConfig)}

_lock = threading.Lock()
_config: Optional[NDBConfig] = None


def _from_env(cfg: NDBConfig) -> NDBConfig:
    for f in fields(NDBConfig):
        env = os.environ.get("NEURONDB_TPU_" + f.name.upper())
        if env is None:
            continue
        if f.type in ("bool", bool):
            cfg.set(f.name, env.lower() in ("1", "true", "on", "yes"))
        else:
            cfg.set(f.name, env)
    return cfg


def get_config() -> NDBConfig:
    global _config
    with _lock:
        if _config is None:
            _config = _from_env(NDBConfig())
        return _config


def set_config(cfg: NDBConfig) -> None:
    global _config
    with _lock:
        _config = cfg


def configure(**kwargs: Any) -> NDBConfig:
    """Set many knobs at once: ``configure(hnsw_ef_search=128)``."""
    cfg = get_config()
    for k, v in kwargs.items():
        cfg.set(k, v)
    return cfg
