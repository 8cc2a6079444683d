"""Test alias for the framework synthetic-data generators."""

from mfar_tpu.data.synth import (  # noqa: F401
    make_amazon_corpus,
    make_queries_and_qrels,
    write_dataset_dir,
)
