"""Smoke-run every example script — examples are user-facing API surface
and must not bit-rot. Each main() builds (or reuses) the session and
runs a small end-to-end pipeline."""

import importlib.util
import os
import sys

import pytest

EXAMPLES = [
    "batch_pipeline",
    "streaming_pipeline",
    "multimodal_pipeline",
    "training_data_pipeline",
    "connector_pipeline",
    "embedding_pipeline",
    "release_pipeline",
    "retrieval_pipeline",
    "marketing_pipeline",
    "experimentation_pipeline",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name, monkeypatch):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", f"{name}.py")
    # examples read the sf dir from argv[1]; pytest's argv would leak in
    monkeypatch.setattr(sys, "argv", [path, "/root/testdata/sf0.001"])
    spec = importlib.util.spec_from_file_location(f"examples.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()  # must complete without raising
