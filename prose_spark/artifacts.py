"""Model-artifact access that works both from a filesystem checkout and
from a spark-submit --py-files zip (zipimport), via importlib.resources."""

from __future__ import annotations

import importlib.resources
from pathlib import Path

MODELS_DIR = Path(__file__).resolve().parent / "models"


def read_bytes(name: str) -> bytes:
    """Read prose_spark/models/<name> from disk or from the package zip."""
    p = MODELS_DIR / name
    try:
        if p.is_file():
            return p.read_bytes()
    except OSError:
        pass
    ref = importlib.resources.files("prose_spark").joinpath("models", name)
    return ref.read_bytes()
