"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata (training-data pipeline surface; no reference
counterpart, BASELINE.json north star).

Design: content is a `binary` column + a `modality` tag + typed metadata
struct. Decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages — the Spark-side plumbing (schemas,
batch shape, partition fan-out) is real and tested; the codec calls
themselves are STUBBED behind `register_decoder` because image/audio
libraries are absent in this environment by design. A deployment plugs in
PIL/torchaudio/ffmpeg by registering real decoders with the same
signature (bytes -> dict of features).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shuttlestandalonedbcreator_spark.operators.util import fan_out

# modality -> (bytes -> feature dict with keys of FEATURE_SCHEMA)
_DECODERS: dict[str, Callable[[bytes], dict]] = {}

FEATURE_SCHEMA = (
    "content_id long, modality string, n_bytes long, sha string, "
    "width int, height int, duration_ms int, feature_ok boolean, feature_err string"
)


def register_decoder(modality: str, fn: Callable[[bytes], dict]) -> None:
    _DECODERS[modality] = fn


def deterministic_fake_decoder(modality: str) -> Callable[[bytes], dict]:
    """Test decoder: derives stable pseudo-dimensions from the bytes —
    exercises the full distributed path without codec libraries."""

    def decode(data: bytes) -> dict:
        h = sum(data[:64]) if data else 0
        return {
            "width": 16 + h % 64 if modality == "image" else None,
            "height": 16 + (h // 64) % 64 if modality == "image" else None,
            "duration_ms": 1000 + h % 9000 if modality in ("audio", "video") else None,
        }

    return decode


def stub_decoder(modality: str) -> Callable[[bytes], dict]:
    """Production placeholder: fails loudly so missing codecs are never
    silently swallowed (feature_ok=False carries the error per row)."""

    def decode(data: bytes) -> dict:
        raise NotImplementedError(
            f"no {modality} codec in this environment — register a real "
            "decoder (PIL/torchaudio/ffmpeg) via register_decoder()"
        )

    return decode


def attach_binary_metadata(
    df: DataFrame, content_col: str, id_col: str, modality_col: str
) -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest. No UDF."""
    return df.select(
        F.col(id_col).alias("content_id"),
        F.col(modality_col).alias("modality"),
        F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(content_col), 256).alias("sha"),
        F.col(content_col).alias("content"),
    )


def extract_features(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Arrow-batched decode/feature stage over (content_id, modality,
    n_bytes, sha, content). Per-row errors are captured, not thrown —
    operator E1's skip-and-count semantics applied to codecs."""

    # ship this module (incl. the registered-decoder snapshot) by value —
    # executors may not have the repo importable
    import shuttlestandalonedbcreator_spark.streaming.multimodal as _self_module
    from pyspark.cloudpickle import register_pickle_by_value

    register_pickle_by_value(_self_module)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                modality = row["modality"]
                decoder = _DECODERS.get(modality)
                feats = {"width": None, "height": None, "duration_ms": None}
                ok, err = False, None
                if decoder is None:
                    err = f"no decoder registered for modality '{modality}'"
                else:
                    try:
                        feats.update(decoder(bytes(row[content_col])))
                        ok = True
                    except Exception as e:  # per-row skip (E1)
                        err = str(e)[:200]
                out.append(
                    {
                        "content_id": row["content_id"],
                        "modality": modality,
                        "n_bytes": row["n_bytes"],
                        "sha": row["sha"],
                        "width": feats["width"],
                        "height": feats["height"],
                        "duration_ms": feats["duration_ms"],
                        "feature_ok": ok,
                        "feature_err": err,
                    }
                )
            yield pd.DataFrame(out)

    return fan_out(df).mapInPandas(run, schema=FEATURE_SCHEMA)
