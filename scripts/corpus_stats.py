"""Per-field token-length percentiles over a corpus -- where the schema
token budgets come from (reference: /root/reference/scripts/corpus_stats.py;
the budgets in mfar_tpu/data/schema.py were derived this way).

Usage:
    python scripts/corpus_stats.py --corpus DS --dataset-name amazon \
        --field-names all_dense [--tokenizer whitespace|<hf-id>]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mfar_tpu.data import trec  # noqa: E402
from mfar_tpu.data.format import format_documents  # noqa: E402
from mfar_tpu.data.schema import resolve_fields  # noqa: E402

PERCENTILES = [100.0, 99.9, 99.0, 95.0, 90.0, 75.0, 50.0]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", required=True, help="directory containing the corpus tsv")
    p.add_argument("--dataset-name", required=True)
    p.add_argument("--field-names", required=True)
    p.add_argument("--tokenizer", default="whitespace",
                   help="whitespace | a HF tokenizer name/dir")
    args = p.parse_args(argv)

    field_info = resolve_fields(args.field_names, args.dataset_name)
    pairs = list(trec.read_corpus(f"{args.corpus}/corpus"))

    if args.tokenizer == "whitespace":
        count = lambda text: len(text.split())
    else:
        from mfar_tpu.models.tokenizer import HFTokenizer

        tok = HFTokenizer.from_pretrained(args.tokenizer, max_length=1 << 20)
        # count from the unpadded encoding: encode_batch pads to a width
        # bucket, which allocates megabytes of zeros per long document
        # just to sum a mask
        t = tok.tokenizer
        if hasattr(t, "encode"):  # tokenizers.Tokenizer
            t.no_truncation()
            count = lambda text: len(t.encode(text).ids)
        else:  # transformers tokenizer
            count = lambda text: len(t(text)["input_ids"])

    print("field," + ",".join(f"p{p_}" for p_ in PERCENTILES))
    seen_names = set()
    for field in field_info.values():
        if field.name in seen_names:
            continue
        seen_names.add(field.name)
        lengths = [
            count(text) for _, text in format_documents(pairs, field.name, field.dataset)
        ]
        row = [
            int(np.ceil(np.percentile(lengths, p_))) if lengths else 0
            for p_ in PERCENTILES
        ]
        print(f"{field.name}," + ",".join(map(str, row)))
    print(f"{len(pairs)} documents")


if __name__ == "__main__":
    main()
