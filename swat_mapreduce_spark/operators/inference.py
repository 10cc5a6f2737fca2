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


# --- real-model path ------------------------------------------------------
# The checkpoint/arch plumbing below is pure Python (no torch import)
# so it is unit-testable in this container; only building the actual
# torchvision module and running the forward pass sit behind the gate.

IMAGENET_MEAN = [0.485, 0.456, 0.406]
IMAGENET_STD = [0.229, 0.224, 0.225]
INPUT_SIZE = 224


def unwrap_checkpoint(ckpt):
    """Unwrap a loaded checkpoint object to its state-dict.

    Mirrors python/predict_batch_threaded_local.py:53-59: training
    frameworks save either the raw state-dict or a wrapper dict keyed
    'state_dict' / 'model_state_dict' / 'model' — first matching dict
    value wins; anything else passes through unchanged.
    """
    if isinstance(ckpt, dict):
        for k in ("state_dict", "model_state_dict", "model"):
            if k in ckpt and isinstance(ckpt[k], dict):
                return ckpt[k]
    return ckpt


def model_arch_for_cfg(model_cfg: str) -> str:
    """'vitb32' anywhere in the cfg string (case-insensitive) selects
    torchvision vit_b_32; everything else falls back to resnet18 —
    python/predict_batch_threaded_local.py:62-70."""
    return "vit_b_32" if "vitb32" in model_cfg.lower() else "resnet18"


def _build_torch_model(ckpt_state, model_cfg: str, num_classes: int):
    """Construct the torchvision model, swap the classification head to
    ``num_classes`` outputs, and load the checkpoint with strict=False
    (python/predict_batch_threaded_local.py:61-76). Requires torch."""
    import torch
    from torch import nn
    from torchvision import models

    if model_arch_for_cfg(model_cfg) == "vit_b_32":
        model = models.vit_b_32(weights=None)
        in_features = model.heads.head.in_features
        model.heads.head = nn.Linear(in_features, num_classes)
    else:
        model = models.resnet18(weights=None)
        in_features = model.fc.in_features
        model.fc = nn.Linear(in_features, num_classes)
    model.eval()
    # strict=False: checkpoints from the reference training runs carry
    # extra heads/buffers; partial load is the documented behavior
    model.load_state_dict(ckpt_state, strict=False)
    return model


def torch_scorer(checkpoint_path: str, model_cfg: str = "vitb32_openclip_laion400m"):
    """Real model scorer (python/predict_batch_threaded_local.py:53-83,
    100-115): load checkpoint → unwrap state-dict → build vit_b_32 or
    resnet18 with a NUM_CLASSES head → per-path PIL decode, RGB,
    224x224 resize, ImageNet normalize → batched no-grad forward.

    Returns the same (logits[B, NUM_CLASSES], decode_ok[B]) contract as
    hash_scorer, so predict_batch applies identical softmax/argmax/
    fallback semantics to both. Decode failures flow through as
    decode_ok=False (→ class-0, prob-0.0 fallback rows), exactly the
    reference's per-image try/except (predict_batch_threaded_local.py:
    100-107).
    """
    try:
        import torch
        from PIL import Image
        from torchvision import transforms
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "torch/PIL not available in this container; use hash_scorer()"
        ) from e

    ckpt = torch.load(checkpoint_path, map_location="cpu")
    model = _build_torch_model(unwrap_checkpoint(ckpt), model_cfg, NUM_CLASSES)
    preprocess = transforms.Compose(
        [
            transforms.Resize((INPUT_SIZE, INPUT_SIZE)),
            transforms.ToTensor(),
            transforms.Normalize(mean=IMAGENET_MEAN, std=IMAGENET_STD),
        ]
    )

    def score(paths: pd.Series):
        import io

        tensors, ok = [], np.zeros(len(paths), dtype=bool)
        for i, p in enumerate(paths):
            try:
                # payload-bearing rows (bytes) decode in-memory; string
                # rows are filesystem paths like the reference CLI
                src = io.BytesIO(p) if isinstance(p, (bytes, bytearray)) else p
                img = Image.open(src).convert("RGB")
                tensors.append(preprocess(img))
                ok[i] = True
            except Exception:  # noqa: BLE001 - decode fallback by contract
                pass
        logits = np.zeros((len(paths), NUM_CLASSES), dtype=np.float64)
        if tensors:
            with torch.no_grad():
                out = model(torch.stack(tensors, dim=0))
            logits[ok] = out.cpu().numpy().astype(np.float64)
        return logits, ok

    return score


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


BINARY_PREDICTION_SCHEMA = "doc_id long, class string, prob double"


def predict_batch_from_payload(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Content-addressed inference: logits are a function of the BYTES,
    not the path — the deterministic stand-in for a real forward pass
    over fetched binary objects (java/PredictBatchMapperCluster.java:
    51-67 fetches per-record files and scores the decoded pixels).

    The scorer key is md5(content) hex, fed through the same block-md5
    logit construction as hash_scorer, so softmax/argmax/fallback
    semantics are byte-identical to the path-keyed pipeline and the
    DuckDB oracle can reproduce them via md5(text).
    """

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        classes = np.array(CLASS_NAMES)
        for pdf in batches:
            keys = pd.Series(
                [hashlib.md5(bytes(c)).hexdigest() for c in pdf[content_col]]
            )
            logits = hash_logits_np(keys)
            ok = hash_decode_ok_np(keys)
            e = np.exp(logits)
            probs = e / e.sum(axis=1, keepdims=True)
            idx = np.argmax(logits, axis=1)
            prob = probs[np.arange(len(pdf)), idx]
            idx = np.where(ok, idx, 0)
            prob = np.where(ok, prob, 0.0)
            guarded = np.where(idx < len(classes), idx, 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "class": classes[guarded],
                    "prob": prob,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        infer, schema=BINARY_PREDICTION_SCHEMA
    )
