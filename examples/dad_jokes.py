"""Build a jokes knowledge base from a CSV, dedup it, and publish it.

The svs_tpu equivalent of the reference's "Build Dad Jokes KB" notebook:
  1. bulk-load one document per joke (embedding fetched in 200-text chunks),
  2. find near-duplicates with the blocked pairwise kernel and delete them,
  3. close(vacuum=True, also_gzip=True) to publish a shareable .gz.

Usage:
    python examples/dad_jokes.py jokes.csv --column joke [--mock]

With --mock no network is needed (useful for trying the pipeline);
otherwise set OPENAI_API_KEY.
"""

import argparse
import csv

from svs_tpu import KB, make_mock_embeddings_func, make_openai_embeddings_func
from svs_tpu.utils import load_env
from svs_tpu.tools import find_near_duplicates
load_env()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("csv_path")
    parser.add_argument("--column", default="joke")
    parser.add_argument("--db", default="jokes.sqlite")
    parser.add_argument("--dedup-threshold", type=float, default=0.95)
    parser.add_argument("--mock", action="store_true")
    args = parser.parse_args()

    embed = (
        make_mock_embeddings_func()
        if args.mock
        else make_openai_embeddings_func()
    )
    kb = KB(args.db, embed, force_fresh_db=True)

    with open(args.csv_path, newline="") as f:
        rows = [row[args.column].strip() for row in csv.DictReader(f)]
    rows = [r for r in rows if r]
    print(f"loading {len(rows)} jokes...")
    with kb.bulk_add_docs() as add_doc:
        for joke in rows:
            add_doc(joke)

    if not args.mock:  # mock embeddings are all identical: everything "dups"
        dups = find_near_duplicates(kb, threshold=args.dedup_threshold)
        doomed = {doc2 for _, _, doc2 in dups}
        print(f"deleting {len(doomed)} near-duplicates...")
        with kb.bulk_del_docs() as del_doc:
            for doc_id in doomed:
                del_doc(doc_id)

    print("sample retrieval:", kb.retrieve("why did the chicken...", 3))
    kb.close(vacuum=True, also_gzip=True)
    print(f"published {args.db}.gz")


if __name__ == "__main__":
    main()
