#!/usr/bin/env python
"""BPE batched-trainer saturation rehearsal (VERDICT r9 ask #5).

The registered `text_bpe_train_batched` entry exhausts the shipped
fixtures' ~90-merge inventory, and round 9's 2.6k-word fixture exhausted
at 805 merges — so the "~0.06 s/merge stays flat to a 32k vocab" claim
rested on the K-cap analysis alone. This script generates a synthetic
WIDE-vocabulary corpus (outside the oracle fixtures, as the ask allows),
runs the same `_bpe_fit_batched` loop for >= 5,000 merges, and records
per-round yield + wall-clock so flatness is measured, not argued.

Corpus: 60k distinct lowercase words (lengths 7-14, seeded RNG, Zipf
frequencies via per-word counts 1 + 120000//rank capped) — a merge
inventory of sum(len(word)-1) >> 5k. Corpus size is irrelevant past the
first aggregate (the trainer's per-round work is vocabulary-sized).

Writes docs/BPE_SATURATION_r10.json.
"""
from __future__ import annotations

import json
import os
import random
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_MERGES = int(os.environ.get("BPE_SAT_TARGET", "5000"))
MAX_ROUNDS = int(os.environ.get("BPE_SAT_MAX_ROUNDS", "400"))
N_WORDS = 60_000


def main() -> None:
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.queries.llm_pipeline import _bpe_fit_batched
    from stream_processor_spark.session import get_spark

    spark = get_spark("bpe-saturation-r10")
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(20260815)
    words = set()
    while len(words) < N_WORDS:
        n = rng.randint(7, 14)
        words.add("".join(rng.choice(string.ascii_lowercase) for _ in range(n)))
    words = sorted(words)
    rng.shuffle(words)

    # documents table: ~40 words per doc, Zipf-ish repetition (word i
    # appears 1 + 6000 // (i+1) times, capped) — frequency diversity so
    # ranks are meaningful, like a real corpus
    bag = []
    for i, w in enumerate(words):
        bag.extend([w] * min(1 + 6000 // (i + 1), 50))
    rng.shuffle(bag)
    docs = [
        (d, " ".join(bag[d * 40 : (d + 1) * 40]))
        for d in range(len(bag) // 40)
    ]
    tmp = tempfile.mkdtemp(prefix="bpe_sat_")
    spark.createDataFrame(docs, "doc_id long, text string").repartition(
        32
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    t = Tables(spark, tmp)
    print(
        f"corpus: {len(docs)} docs, {len(bag)} words, {len(words)} distinct",
        flush=True,
    )

    rounds: list[dict] = []
    state = {"merges": 0, "done": False}

    def on_round(rnd: int, yielded: int, sec: float) -> None:
        state["merges"] += yielded
        rounds.append(
            {"round": rnd, "yield": yielded, "sec": round(sec, 3),
             "merges_cum": state["merges"]}
        )
        if rnd % 10 == 0 or state["merges"] >= TARGET_MERGES:
            print(
                f"round {rnd}: +{yielded} -> {state['merges']} merges, "
                f"{sec:.2f}s this round",
                flush=True,
            )
        if state["merges"] >= TARGET_MERGES and not state["done"]:
            state["done"] = True
            raise StopIteration  # reached the target; stop the loop

    t0 = time.perf_counter()
    try:
        merges, _vocab = _bpe_fit_batched(
            t, rounds=MAX_ROUNDS, on_round=on_round
        )
    except StopIteration:
        pass
    total = time.perf_counter() - t0

    n = state["merges"]
    per_merge = total / max(n, 1)
    decile = max(1, len(rounds) // 10)
    first = [r["sec"] for r in rounds[:decile]]
    last = [r["sec"] for r in rounds[-decile:]]
    rec = {
        "experiment": "r10_bpe_saturation",
        "date": "2026-08-15",
        "corpus": {
            "n_docs": len(docs),
            "n_words": len(bag),
            "distinct_words": len(words),
        },
        "target_merges": TARGET_MERGES,
        "merges_reached": n,
        "rounds_run": len(rounds),
        "total_sec": round(total, 1),
        "sec_per_merge": round(per_merge, 4),
        "mean_yield_per_round": round(n / max(len(rounds), 1), 1),
        "round_sec_first_decile_mean": round(sum(first) / len(first), 2),
        "round_sec_last_decile_mean": round(sum(last) / len(last), 2),
        "flatness_last_over_first": round(
            (sum(last) / len(last)) / max(sum(first) / len(first), 1e-9), 2
        ),
        "per_round": rounds,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "docs", "BPE_SATURATION_r10.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(
        json.dumps({k: v for k, v in rec.items() if k != "per_round"},
                   indent=1)
    )
    spark.stop()


if __name__ == "__main__":
    main()
