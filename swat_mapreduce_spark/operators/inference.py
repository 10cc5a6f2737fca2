"""Batch model inference as an Arrow-batched ``mapInPandas`` stage.

This is the Spark-native replacement for the reference's whole
subprocess/IPC layer (``java/PredictBatchMapperCluster.java:86-138``:
fork python per 32-image batch, parse CSV stdout) and for the model
lifecycle in ``python/predict_batch_threaded_local.py``:

* model loaded ONCE per Python worker (lazy module-level singleton) —
  not re-loaded per 32-row batch like the reference (SURVEY.md §4 fix a)
* batching via Arrow (``spark.sql.execution.arrow.maxRecordsPerBatch``
  plays the reference's BATCH_SIZE=32 role) — partial final batches are
  automatic
* stderr/exit-code fragility gone: exceptions surface as task errors

The scorer is pluggable:
* ``hash_scorer`` — deterministic md5 logits (functions/hashing.py),
  used everywhere in tests/correctness; numerically IDENTICAL to the
  JVM expression path in operators/classify.py, so the same DuckDB
  oracle validates this Python path.
* ``torch_scorer`` — the real ViT-B/32 / ResNet18 path
  (python/predict_batch_threaded_local.py:62-77), gated behind a torch
  import; raises NotImplementedError in containers without torch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from swat_mapreduce_spark.labels import CLASS_NAMES, NUM_CLASSES

PREDICTION_SCHEMA = "image_path string, class string, prob double"

# per-worker scorer singleton (lazy; survives across Arrow batches)
_SCORER_STATE: dict = {}


def hash_logits_np(paths: pd.Series, num_classes: int = NUM_CLASSES) -> np.ndarray:
    """Vectorized md5 logits, bit-identical to functions/hashing.logit:
    one md5 digest per block of 8 classes; logit_i = int(hex nibbles
    [4*(i%8), 4*(i%8)+4) of md5(f"{p}:{i//8}"), 16) / 4096 - 8."""
    n_blocks = (num_classes + 7) // 8
    out = np.empty((len(paths), num_classes), dtype=np.float64)
    for r, p in enumerate(paths):
        for b in range(n_blocks):
            h = hashlib.md5(f"{p}:{b}".encode()).hexdigest()
            for j in range(min(8, num_classes - b * 8)):
                out[r, b * 8 + j] = (
                    int(h[j * 4 : j * 4 + 4], 16) / 4096.0 - 8.0
                )
    return out


def hash_decode_ok_np(paths: pd.Series) -> np.ndarray:
    out = np.empty(len(paths), dtype=bool)
    for r, p in enumerate(paths):
        h = hashlib.md5(f"{p}:decode".encode()).hexdigest()[:2]
        out[r] = int(h, 16) >= 13
    return out


def hash_scorer() -> Callable[[pd.Series], tuple[np.ndarray, np.ndarray]]:
    """Deterministic scorer: returns (logits[B,30], decode_ok[B])."""

    def score(paths: pd.Series):
        return hash_logits_np(paths), hash_decode_ok_np(paths)

    return score


def torch_scorer(checkpoint_path: str, model_cfg: str = "vitb32_openclip_laion400m"):
    """Real model scorer (python/predict_batch_threaded_local.py:62-83):
    'vitb32' in cfg → torchvision vit_b_32, else resnet18; linear head
    replaced with NUM_CLASSES outputs; checkpoint dict unwrapped from
    state_dict/model_state_dict/model keys; load_state_dict(strict=False);
    eval(); 224x224 RGB, ImageNet normalize; softmax over logits."""
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "torch not available in this container; use hash_scorer()"
        ) from e
    raise NotImplementedError("torch scoring wiring pending torch availability")


def _get_scorer(scorer_factory):
    key = id(scorer_factory)
    if key not in _SCORER_STATE:
        # lazy one-time init per Python worker — the reference re-did
        # this per 32-image batch (java/PredictBatchMapperCluster.java:97)
        _SCORER_STATE[key] = scorer_factory()
    return _SCORER_STATE[key]


def predict_batch(
    paths_df: DataFrame,
    scorer_factory: Callable = hash_scorer,
    path_col: str = "image_path",
) -> DataFrame:
    """manifest paths → (image_path, class, prob) via mapInPandas.

    Semantics identical to the reference CLI
    (python/predict_batch_threaded_local.py:137-160): softmax → top-1 →
    label lookup with out-of-range guard → decode-failure fallback row
    ``(path, CLASS_NAMES[0], 0.0)``.
    """

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        score = _get_scorer(scorer_factory)
        classes = np.array(CLASS_NAMES)
        for pdf in batches:
            paths = pdf[path_col]
            logits, ok = score(paths)
            # softmax (stable form irrelevant at these magnitudes, but
            # match the JVM expression exactly: exp / sum(exp))
            e = np.exp(logits)
            probs = e / e.sum(axis=1, keepdims=True)
            idx = np.argmax(logits, axis=1)  # first-max, same as torch.max
            prob = probs[np.arange(len(pdf)), idx]
            idx = np.where(ok, idx, 0)
            prob = np.where(ok, prob, 0.0)
            guarded = np.where(idx < len(classes), idx, 0)
            yield pd.DataFrame(
                {
                    "image_path": paths.values,
                    "class": classes[guarded],
                    "prob": prob,
                }
            )

    return paths_df.select(path_col).mapInPandas(infer, schema=PREDICTION_SCHEMA)
