"""Query CLI — the reference's QueryProcessorMain
(search_engine/src/main/java/unipi/aide/mircv/queryProcessor/
QueryProcessorMain.java:14-131) re-expressed against the Parquet index.

Interactive mode (S11): reads queries from stdin, `q` exits, a leading
`+` marks the query conjunctive.

Evaluation mode (S8/S9): `--eval QUERIES.tsv --run-out RUN.txt` reads a
TREC `qid \t text` file, scores every query (terms sorted, disjunctive,
as QueryProcessorMain.evaluation:90-131 does), writes a TREC run file
`qid Q0 docno rank score STANDARD` and prints the average latency.

Usage:
    python scripts/query_processor.py INDEX_DIR [--standard BM25|TFIDF|QLD]
        [--mu MU] [--algo auto|maxscore|wand|bmw] [--k K] [--no-parse]
        [--eval QUERIES.tsv --run-out RUN.txt]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--standard", default="BM25",
                    choices=["BM25", "TFIDF", "QLD"])
    ap.add_argument("--mu", type=float, default=2000.0,
                    help="QLD Dirichlet smoothing parameter")
    ap.add_argument("--algo", default=None,
                    choices=["auto", "maxscore", "wand", "bmw"],
                    help="disjunctive scoring algorithm (default auto)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-parse", action="store_true")
    ap.add_argument("--eval", dest="eval_tsv", default=None)
    ap.add_argument("--run-out", default="run.txt")
    ap.add_argument("--qrels", default=None,
                    help="TREC qrels file: print MAP@20/NDCG@20 of the "
                         "run (requires --eval)")
    ap.add_argument("--metric-k", type=int, default=20)
    ap.add_argument("--map-rel-threshold", type=int, default=1,
                    help="binarize rel >= this for MAP (TREC-DL: 2)")
    ap.add_argument("--maxscore", action="store_true",
                    help="force the sequential MaxScore loop")
    ap.add_argument("--golden", default=None,
                    help="golden TREC run (e.g. the reference's "
                         "qres_BM25_not_parsed.txt): after --eval, "
                         "check rank identity + score closeness of "
                         "the produced run against it")
    ap.add_argument("--score-rtol", type=float, default=1e-6)
    args = ap.parse_args()

    from mircv_ray.config import QueryConfig
    from mircv_ray.query import QueryEngine

    qcfg = QueryConfig(standard=args.standard, k=args.k,
                       parse=not args.no_parse, mu=args.mu,
                       algo=args.algo or ("maxscore" if args.maxscore
                                          else "auto"))
    eng = QueryEngine(args.index_dir, qcfg)

    if args.eval_tsv:
        rows = []
        lat = []
        with open(args.eval_tsv) as f:
            for line in f:
                if "\t" not in line:
                    continue
                qid, text = line.rstrip("\n").split("\t", 1)
                t0 = time.time()
                # evaluation mode sorts terms and is always disjunctive
                # (QueryProcessorMain.java:105-109)
                res = eng.query(text, conjunctive=False, sort_terms=True)
                lat.append(time.time() - t0)
                for rank, (docno, score) in enumerate(res, start=1):
                    rows.append(f"{qid} Q0 {docno} {rank} {score} "
                                f"{args.standard}\n")
        Path(args.run_out).write_text("".join(rows))
        avg = sum(lat) / max(len(lat), 1)
        print(f"{len(lat)} queries, avg latency {avg * 1000:.1f} ms, "
              f"run file: {args.run_out}")
        if args.qrels:
            from mircv_ray.eval import evaluate_run
            m = evaluate_run(args.run_out, args.qrels, k=args.metric_k,
                             map_rel_threshold=args.map_rel_threshold)
            print(f"MAP@{m['k']} = {m['map_cut']:.4f}  "
                  f"NDCG@{m['k']} = {m['ndcg_cut']:.4f}  "
                  f"({m['num_queries']} judged queries, "
                  f"rel>={m['map_rel_threshold']} for MAP)")
        if args.golden:
            from mircv_ray.eval import compare_runs
            rep = compare_runs(args.run_out, args.golden,
                               k=args.k, score_rtol=args.score_rtol)
            print(f"golden parity vs {args.golden}: "
                  f"{'OK' if rep['ok'] else 'MISMATCH'} "
                  f"({rep['num_shared_queries']} shared queries, "
                  f"rank mismatches {len(rep['rank_mismatch_qids'])}, "
                  f"max score rel diff {rep['max_score_rel_diff']:.2e})")
            if not rep["ok"]:
                sys.exit(2)
        return

    # interactive loop (QueryProcessorMain.java:48-85)
    print("enter query ('+' prefix = conjunctive, 'q' to exit)")
    for line in sys.stdin:
        text = line.strip()
        if text == "q":
            break
        if not text:
            continue
        t0 = time.time()
        res = eng.query(text)
        dt = (time.time() - t0) * 1000
        for rank, (docno, score) in enumerate(res, start=1):
            print(f"{rank:3d}. docno={docno:>10s}  score={score:.6f}")
        print(f"({len(res)} results in {dt:.1f} ms)")


if __name__ == "__main__":
    main()
