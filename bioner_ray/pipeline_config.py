"""Config-driven pipeline composition — the user-extension surface
(SURVEY.md §2.10): named, parameterized stages chained over a
``ray.data.Dataset`` from a plain dict (JSON-able, so a YAML/JSON file
or a ``ray job submit`` argument can describe a whole pipeline).

The reference parameterizes pipelines through argparse entry points
(`main.py:13-87`, `annotate_dataset.py:24-49`) and a Makefile grid; the
Ray-native equivalent is a declarative stage list, because a Dataset
plan is itself a value that stages build up lazily:

    cfg = {"stages": [
        {"stage": "extract"},
        {"stage": "segment", "params": {"with_offsets": False}},
        {"stage": "quality_filter", "params": {"min_tokens": 20}},
    ]}
    run = build_pipeline(cfg)
    out = run(ray.data.read_parquet(pages))   # still lazy, still streaming

Every registered stage is ``(ds, **params) -> ds``: composition cannot
break streaming because nothing here executes — the streaming executor
still schedules the fused plan. Unknown stage names and unknown params
fail loudly at BUILD time (before any cluster work is launched), with
the full list of valid options in the error.
"""

from __future__ import annotations

from bioner_ray.sources.parquet_io import read_parquet_clean

import inspect
from dataclasses import dataclass
from typing import Any, Callable

__all__ = ["StageSpec", "STAGES", "register_stage", "build_pipeline", "run_config"]


@dataclass(frozen=True)
class StageSpec:
    """The Stage protocol: a name, a builder ``(ds, **params) -> ds``,
    its accepted params (derived from the builder signature), and a
    one-line doc for discovery/error messages."""

    name: str
    builder: Callable[..., Any]
    params: frozenset[str]
    doc: str


STAGES: dict[str, StageSpec] = {}


def register_stage(name: str, doc: str | None = None):
    """Register a ``(ds, **params) -> ds`` builder under ``name``.
    Library stages below; users add their own the same way."""

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        sig = inspect.signature(fn)
        params = frozenset(list(sig.parameters)[1:])  # first param is ds
        STAGES[name] = StageSpec(name, fn, params, (doc or fn.__doc__ or "").strip())
        return fn

    return deco


def build_pipeline(cfg: dict | list) -> Callable[[Any], Any]:
    """Validate a config and return ``dataset -> dataset``.

    ``cfg`` is ``{"stages": [{"stage": name, "params": {...}}, ...]}``
    (or the bare stage list). Validation is eager and total: every
    stage name and every param is checked before anything runs.
    """
    stages = cfg["stages"] if isinstance(cfg, dict) else cfg
    plan: list[tuple[StageSpec, dict]] = []
    for i, entry in enumerate(stages):
        name = entry.get("stage")
        if name not in STAGES:
            raise ValueError(
                f"stage[{i}]: unknown stage {name!r}; known: {sorted(STAGES)}"
            )
        spec = STAGES[name]
        params = dict(entry.get("params", {}))
        unknown = set(params) - spec.params
        if unknown:
            raise ValueError(
                f"stage[{i}] {name!r}: unknown params {sorted(unknown)}; "
                f"accepted: {sorted(spec.params)}"
            )
        plan.append((spec, params))

    def run(ds):
        for spec, params in plan:
            ds = spec.builder(ds, **params)
        return ds

    return run


def run_config(cfg: dict | list, input_path: str, output_path: str, columns=None) -> dict:
    """Read parquet → configured stages → partitioned parquet out."""
    import ray.data as rd

    ds = read_parquet_clean(input_path, columns=columns)
    out = build_pipeline(cfg)(ds)
    out.write_parquet(output_path)
    check = rd.read_parquet(output_path)
    return {"rows": check.count(), "stages": [s["stage"] for s in (cfg["stages"] if isinstance(cfg, dict) else cfg)]}


# ---------------------------------------------------------------- stages

@register_stage("extract", "HTML → text extraction (byte-identical per url)")
def _extract(ds):
    from bioner_ray.stages.extract import extract_stage

    return extract_stage(ds)


@register_stage("segment", "sentence segmentation into nested sentence rows")
def _segment(ds, with_offsets: bool = True, batch_size: int = 256):
    from bioner_ray.stages.segment import segment_stage

    return segment_stage(ds, with_offsets=with_offsets, batch_size=batch_size)


@register_stage("lang_filter", "keep rows whose lang column equals the given value")
def _lang_filter(ds, lang: str = "en", lang_col: str = "lang"):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.equal(t[lang_col], lang)), batch_format="pyarrow"
    )


@register_stage("langid", "stopword-profile language prediction per doc")
def _langid(ds, text_col: str = "text", id_col: str = "doc_id"):
    from bioner_ray.stages.textstats import langid_stage

    return langid_stage(ds, text_col=text_col, id_col=id_col)


@register_stage("quality_filter", "C4-style token-window + lexical-diversity gate")
def _quality(ds, text_col: str = "text", min_tokens: int = 10, max_tokens: int = 1_000_000, min_ttr: float = 0.0):
    from bioner_ray.stages.textstats import quality_filter_stage

    return quality_filter_stage(
        ds, text_col=text_col, min_tokens=min_tokens, max_tokens=max_tokens, min_ttr=min_ttr
    )


@register_stage("token_stats", "per-doc token statistics + quality scores")
def _token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    from bioner_ray.stages.textstats import token_stats_stage

    return token_stats_stage(ds, text_col=text_col, id_col=id_col)


@register_stage("repetition_stats", "Gopher-style repetition signals per doc")
def _repetition(ds, text_col: str = "text", id_col: str = "doc_id"):
    from bioner_ray.stages.textstats import repetition_stats_stage

    return repetition_stats_stage(ds, text_col=text_col, id_col=id_col)


@register_stage("stratified_sample", "deterministic per-stratum hash sampling")
def _sample(ds, rates_permille: dict | None = None, default_permille: int = 1000, id_col: str = "doc_id", stratum_col: str = "lang"):
    from bioner_ray.stages.sampling import stratified_sample_stage

    return stratified_sample_stage(
        ds, rates_permille or {}, default_permille, id_col=id_col, stratum_col=stratum_col
    )


@register_stage("decontaminate", "drop docs sharing any n-gram with the eval parquet")
def _decontaminate(ds, eval_path: str = "", n: int = 8, id_col: str = "doc_id", text_col: str = "text"):
    import ray.data as rd

    from bioner_ray.stages.contamination import decontaminate_stage, eval_gram_set

    ev = read_parquet_clean(eval_path, columns=[text_col])
    return decontaminate_stage(
        ds, eval_gram_set(ev, n=n, text_col=text_col), n=n, id_col=id_col, text_col=text_col
    )


@register_stage("select_columns", "project to the named columns")
def _select(ds, columns: list | None = None):
    return ds.select_columns(list(columns or []))


@register_stage("limit", "truncate to the first n rows")
def _limit(ds, n: int = 1000):
    return ds.limit(n)


@register_stage("repartition", "repartition into n blocks (shuffle optional)")
def _repartition(ds, num_blocks: int = 64, shuffle: bool = False):
    return ds.repartition(num_blocks, shuffle=shuffle)


@register_stage("segment_dedup", "C4-style segment-level first-occurrence dedup stats")
def _segment_dedup(ds, window: int = 10, text_col: str = "text", id_col: str = "doc_id"):
    from bioner_ray.stages.dedup import segment_dedup

    return segment_dedup(ds, window=window, text_col=text_col, id_col=id_col)


@register_stage("weighted_sample", "deterministic bottom-k priority sample (weight-proportional)")
def _weighted_sample(ds, k: int = 50, weight_col: str = "n_chars", id_col: str = "doc_id"):
    from bioner_ray.stages.sampling import weighted_sample_stage

    return weighted_sample_stage(ds, k=k, weight_col=weight_col, id_col=id_col)
