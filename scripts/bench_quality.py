#!/usr/bin/env python
"""Quality benchmarks on committed fixture datasets (VERDICT r2 item 5).

The reference's quality tables (``/root/reference/README.md:748-882``) are
Sequential-NIAH / FactGuard (long-document needle retrieval) and metadata
timeliness/popularity retrieval. This harness reproduces both at fixture
scale with deterministic, committed datasets:

  niah        — long synthetic documents with 1-3 unique needle facts
                inserted at varied depths; queries ask for a needle;
                configs: naive dense top-15 (the ref baseline), two-stage
                recall→rerank KB search (the ref "KB Search" row), hybrid
                dense+BM25 RRF.
  timeliness  — versioned reports across years with publish_ts metadata;
                temporal queries where only the asked-for window is
                relevant; configs: plain dense vs dense + compiled
                time-range filters (the meta-retrieval path).

Embeddings default to the deterministic hash embedder (hermetic); pass
``--provider tpu`` to run the in-repo encoder (optionally with pretrained
weights via --pretrained DIR — models/pretrained.py layouts).

Run:  python scripts/bench_quality.py [--provider hash]
Writes benchmarks/data/*.jsonl (fixtures) + benchmarks/quality_report.json.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks", "data"
)

_TOPICS = [
    "glacier hydrology", "submarine cables", "wheat genetics", "urban transit",
    "volcano monitoring", "archival microfilm", "battery chemistry", "coral reefs",
    "radio astronomy", "supply logistics", "fermentation science", "textile dyes",
    "bridge engineering", "plankton ecology", "desert irrigation", "museum curation",
]

_FILLER = [
    "The committee reviewed the quarterly findings on {t} without major objections.",
    "Several field teams reported routine observations about {t} during the survey.",
    "Methodology for {t} followed the standard protocol established years earlier.",
    "Funding for the {t} program remained stable across the reporting period.",
    "The appendix lists calibration details for the {t} instruments in use.",
    "Researchers noted that {t} trends matched the long-term historical average.",
    "A workshop on {t} was scheduled to consolidate the preliminary results.",
    "Data retention policies for {t} records were reaffirmed by the council.",
]


def gen_niah(rng, n_docs=240, needles_total=164, sents_per_doc=60):
    """Documents of filler prose; `needles_total` unique facts inserted at
    varied depths. Multi-needle queries (Sequential-NIAH style) reference
    2-3 needles spread across documents."""
    docs = []
    for i in range(n_docs):
        t = _TOPICS[i % len(_TOPICS)]
        sents = [_FILLER[rng.integers(0, len(_FILLER))].format(t=t) for _ in range(sents_per_doc)]
        docs.append({"id": f"niah_doc_{i}", "sents": sents, "topic": t})

    needles = []
    for j in range(needles_total):
        code = int(rng.integers(10000, 99999))
        token = f"artifact-{chr(65 + j % 26)}{j}"
        fact = f"The registry number assigned to {token} is {code}."
        d = docs[int(rng.integers(0, n_docs))]
        depth = int(rng.integers(0, len(d["sents"])))
        d["sents"].insert(depth, fact)
        needles.append({"token": token, "code": code, "doc": d["id"]})

    qrels = []
    for nd in needles:
        qrels.append(
            {
                "query": f"What is the registry number assigned to {nd['token']}?",
                "relevant": [nd["doc"]],
            }
        )
    # sequential multi-needle queries: 2-3 needles at once
    for s in range(0, needles_total - 3, 4):
        group = needles[s : s + 3]
        qrels.append(
            {
                "query": "List the registry numbers assigned to "
                + ", ".join(nd["token"] for nd in group) + ".",
                "relevant": sorted({nd["doc"] for nd in group}),
            }
        )
    out_docs = [{"id": d["id"], "content": " ".join(d["sents"]), "metadata": {"topic": d["topic"]}} for d in docs]
    return out_docs, qrels


def gen_timeliness(rng, n_topics=40, years=(2019, 2025)):
    """Per topic, one report per year with publish_ts metadata. Queries ask
    for a specific year or 'latest'; only that window is relevant. Report
    text is near-identical across years (the adversarial part: dense
    similarity cannot separate years — the metadata filter must)."""
    import calendar

    docs = []
    qrels = []
    for i in range(n_topics):
        t = _TOPICS[i % len(_TOPICS)] + f" region {i}"
        year_docs = {}
        for y in range(years[0], years[1] + 1):
            month = int(rng.integers(1, 13))
            ts = int(
                __import__("datetime").datetime(y, month, 15).timestamp()
            )
            did = f"time_doc_{i}_{y}"
            year_docs[y] = did
            docs.append(
                {
                    "id": did,
                    "content": (
                        f"Annual report on {t}. This document summarizes field "
                        f"operations, instrumentation status and budget usage for {t}. "
                        f"Published {calendar.month_name[month]} {y}."
                    ),
                    "metadata": {"topic_id": i, "publish_ts": ts, "year": y},
                }
            )
        # year-pinned query
        y = int(rng.integers(years[0], years[1] + 1))
        t0 = int(__import__("datetime").datetime(y, 1, 1).timestamp())
        t1 = int(__import__("datetime").datetime(y + 1, 1, 1).timestamp())
        qrels.append(
            {
                "query": f"the {y} annual report on {t}",
                "relevant": [year_docs[y]],
                "filters": {"$and": [
                    {"publish_ts": {"$gte": t0}}, {"publish_ts": {"$lt": t1}},
                ]},
            }
        )
        # 'latest' query → most recent year
        t_latest = int(__import__("datetime").datetime(years[1], 1, 1).timestamp())
        qrels.append(
            {
                "query": f"the latest annual report on {t}",
                "relevant": [year_docs[years[1]]],
                "filters": {"publish_ts": {"$gte": t_latest}},
            }
        )
    return docs, qrels


def gen_popularity(rng, n_topics=40, docs_per_topic=6):
    """Per topic, several near-identical library/tool writeups with a
    'downloads' popularity metric. Queries ask for 'the most popular …';
    only the top-popularity doc is relevant. Dense similarity cannot
    separate them — the popularity metadata must (ref: the Popularity
    Preference axis of the metadata-retrieval table, README.md:816-882)."""
    docs = []
    qrels = []
    for i in range(n_topics):
        t = _TOPICS[i % len(_TOPICS)] + f" toolkit family {i}"
        pops = rng.permutation(docs_per_topic)
        best = None
        for j in range(docs_per_topic):
            downloads = int(1000 + 99000 * pops[j] / (docs_per_topic - 1))
            did = f"pop_doc_{i}_{j}"
            if pops[j] == docs_per_topic - 1:
                best = did
            docs.append(
                {
                    "id": did,
                    "content": (
                        f"Overview of implementation {chr(65 + j)} for {t}. This library "
                        f"provides data ingestion, processing and reporting for {t}. "
                        f"It is distributed under an open license."
                    ),
                    "metadata": {"topic_id": i, "downloads": downloads, "variant": j},
                }
            )
        qrels.append(
            {
                "query": f"the most popular library for {t}",
                "relevant": [best],
            }
        )
        qrels.append(
            {
                "query": f"most downloaded implementation for {t}",
                "relevant": [best],
            }
        )
    return docs, qrels


_FACT_KINDS = [
    ("completed in", lambda rng: f"{int(rng.integers(1950, 2020))}"),
    ("spans", lambda rng: f"{int(rng.integers(80, 2400))} meters"),
    ("cost", lambda rng: f"{int(rng.integers(4, 900))} million"),
    ("employs", lambda rng: f"{int(rng.integers(12, 4800))} staff"),
]

_FACT_ENTITIES = [
    "Meridian Bridge", "Harbor Tunnel", "Aster Dam", "Crosswind Viaduct",
    "Northgate Depot", "Solace Observatory", "Ridgeline Funicular",
    "Quarry Locks", "Beacon Pier", "Summit Tramway", "Delta Causeway",
    "Fallow Aqueduct", "Lantern Lighthouse", "Granite Reservoir",
]


def gen_factguard(rng, n_entities=70, sents_per_doc=50):
    """FactGuard-style single-point fact checking over long documents
    (ref README.md:748-812): each entity's long report buries one factual
    statement; distractor entities share infrastructure vocabulary and
    carry *different* values for the same attribute, so surface-similar
    chunks abound. Queries are (a) fact verification, (b) information
    extraction, and (c) reasoning verification across two documents —
    the reference's three FactGuard axes at fixture scale."""
    docs = []
    facts = []
    for i in range(n_entities):
        ent = f"{_FACT_ENTITIES[i % len(_FACT_ENTITIES)]} {i}"
        t = _TOPICS[i % len(_TOPICS)]
        kind, val_fn = _FACT_KINDS[i % len(_FACT_KINDS)]
        val = val_fn(rng)
        sents = [
            _FILLER[rng.integers(0, len(_FILLER))].format(t=t)
            for _ in range(sents_per_doc)
        ]
        fact = f"Engineering records confirm the {ent} {kind} {val}."
        sents.insert(int(rng.integers(0, len(sents))), fact)
        did = f"fact_doc_{i}"
        docs.append({
            "id": did,
            "content": " ".join(sents),
            "metadata": {"entity": ent, "topic": t},
        })
        facts.append({"doc": did, "entity": ent, "kind": kind, "value": val})

    qrels = []
    for f in facts:
        # (a) fact verification
        qrels.append({
            "query": f"Verify this claim: the {f['entity']} {f['kind']} {f['value']}.",
            "relevant": [f["doc"]],
        })
        # (b) information extraction
        qrels.append({
            "query": f"What does the {f['entity']} {f['kind'].split()[0]}"
                     f" according to engineering records?",
            "relevant": [f["doc"]],
        })
    # (c) reasoning verification: compare two entities sharing a fact kind
    by_kind: dict = {}
    for f in facts:
        by_kind.setdefault(f["kind"], []).append(f)
    for kind, group in by_kind.items():
        for a, b in zip(group[::2], group[1::2]):
            qrels.append({
                "query": (
                    f"Does the {a['entity']} or the {b['entity']} have the "
                    f"greater figure for '{kind}'?"
                ),
                "relevant": sorted({a["doc"], b["doc"]}),
            })
    return docs, qrels


def gen_paraphrase(_rng):
    """Zero-lexical-overlap fixture (models/paraphrase_synth.py): documents
    in one pseudo-vocabulary, queries in another naming the same concepts.
    BM25 and the hash embedder score at chance BY CONSTRUCTION; every eval
    concept combination is held out from the canonical training pairs."""
    from youtu_rag_tpu.models.paraphrase_synth import (
        TRAIN_PAIRS_DEFAULT,
        TRAIN_SEED,
        gen_paraphrase_fixture,
        gen_paraphrase_pairs,
    )

    _, used = gen_paraphrase_pairs(TRAIN_PAIRS_DEFAULT, seed=TRAIN_SEED)
    return gen_paraphrase_fixture(n_docs=150, seed=7, exclude=used)


def write_fixtures(regen: bool = False) -> dict[str, tuple[str, str]]:
    import numpy as np

    os.makedirs(DATA_DIR, exist_ok=True)
    out = {}
    for name, gen in (
        ("niah", gen_niah),
        ("timeliness", gen_timeliness),
        ("popularity", gen_popularity),
        ("factguard", gen_factguard),
        ("paraphrase", gen_paraphrase),
    ):
        docs_p = os.path.join(DATA_DIR, f"{name}_docs.jsonl")
        qrels_p = os.path.join(DATA_DIR, f"{name}_qrels.jsonl")
        if regen or not (os.path.exists(docs_p) and os.path.exists(qrels_p)):
            rng = np.random.default_rng(7)
            docs, qrels = gen(rng)
            with open(docs_p, "w") as f:
                for d in docs:
                    f.write(json.dumps(d, ensure_ascii=False) + "\n")
            with open(qrels_p, "w") as f:
                for q in qrels:
                    f.write(json.dumps(q, ensure_ascii=False) + "\n")
        out[name] = (docs_p, qrels_p)
    return out


async def build_kb(name, docs_path, provider, pretrained, reranker="none",
                   lex_gate=None):
    from youtu_rag_tpu.core.config import (
        EmbeddingConfig, KnowledgeBuilderConfig, RAGConfig, RerankerConfig,
        RetrieverConfig,
    )
    from youtu_rag_tpu.core.types import Document
    from youtu_rag_tpu.retrieval.kb import KnowledgeBase

    cfg = RAGConfig(
        knowledge_builder=KnowledgeBuilderConfig(
            embedding=EmbeddingConfig(provider=provider, pretrained_dir=pretrained)
        ),
        retriever=RetrieverConfig(
            top_k=15,
            enable_reranking=reranker != "none",
            recall_multiplier=3,
            reranker_top_k=15,
        ),
        reranker=RerankerConfig(provider=reranker),
    )
    kb = KnowledgeBase(name, cfg)
    if provider == "tpu" and getattr(build_kb, "_npz", None):
        # trained-weight serving: rebind one TpuEmbedder(npz) into the
        # builder + both retrievers (they hold the reference by attr)
        from youtu_rag_tpu.models.embedder import TpuEmbedder
        from youtu_rag_tpu.models.encoder import (
            EncoderConfig,
            load_encoder_config,
            load_params_npz,
        )

        npz_dir = os.path.dirname(os.path.abspath(build_kb._npz))
        cfg_json = os.path.join(npz_dir, "encoder_config.json")
        if os.path.exists(cfg_json):
            # training output dir: exact architecture (incl. lex_pool) +
            # the WordPiece vocab the weights were trained with
            ecfg = load_encoder_config(cfg_json)
        else:
            sizes = {
                "tiny": dict(d_model=128, n_layers=2, n_heads=2, d_ff=512, out_dim=128),
                "small": dict(d_model=384, n_layers=6, n_heads=6, d_ff=1536, out_dim=384),
                "base": dict(d_model=768, n_layers=12, n_heads=12, d_ff=3072, out_dim=768),
            }
            ecfg = EncoderConfig(**sizes[build_kb._preset])
        tokenizer = None
        vocab_txt = os.path.join(npz_dir, "vocab.txt")
        if os.path.exists(vocab_txt):
            from youtu_rag_tpu.models.wordpiece import WordPieceTokenizer

            tokenizer = WordPieceTokenizer(vocab_txt, max_length=ecfg.max_len)
        params = load_params_npz(build_kb._npz)
        if lex_gate is not None and "lex_mix" in params:
            # force the contextual↔lexical blend (sigmoid logit): 0.0 →
            # pure contextual channel, 1.0 → pure lexical channel — the
            # ablation rows of the paraphrase dataset
            import numpy as _np

            params = dict(params)
            params["lex_mix"] = _np.float32(
                _np.log(lex_gate / (1 - lex_gate)) if 0 < lex_gate < 1
                else (-20.0 if lex_gate <= 0 else 20.0)
            )
        emb = TpuEmbedder(
            config=ecfg, params=params,
            batch_size=128, tokenizer=tokenizer,
        )
        kb.embedder = emb
        kb.builder.embedder = emb
        kb.retriever.embedder = emb
        kb.hybrid_retriever.embedder = emb
    docs = []
    with open(docs_path) as f:
        for line in f:
            r = json.loads(line)
            docs.append(Document(id=r["id"], content=r["content"], metadata=r.get("metadata") or {}))
    await kb.build_documents(docs)
    return kb


async def run_all(args) -> dict:
    from youtu_rag_tpu.eval.retrieval_eval import RetrievalBenchmark

    fixtures = write_fixtures(args.regen)
    report: dict = {"provider": args.provider, "datasets": {}}

    # --- NIAH ---
    docs_p, qrels_p = fixtures["niah"]
    samples = RetrievalBenchmark.load_qrels(qrels_p)
    niah = {}
    kb = await build_kb("niah_naive", docs_p, args.provider, args.pretrained)
    niah["naive_top15"] = await RetrievalBenchmark(kb, top_k=15).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    kb2 = await build_kb(
        "niah_rerank", docs_p, args.provider, args.pretrained, reranker="lexical"
    )
    niah["kb_search_rerank"] = await RetrievalBenchmark(kb2, top_k=15).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    niah["hybrid_rrf"] = await RetrievalBenchmark(kb, top_k=15, use_hybrid=True).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    # hybrid → post-fusion rerank (VERDICT r3 item 4): fusion recall with
    # rerank ordering — should dominate hybrid_rrf NDCG and the two-stage
    # recall simultaneously (retrieval/retriever.py:255-257)
    niah["hybrid_rerank"] = await RetrievalBenchmark(kb2, top_k=15, use_hybrid=True).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    niah["hybrid_alpha_sweep"] = await _alpha_sweep(kb, qrels_p)

    # corpus-level BM25 alone (retrieval/lexical.py) and a lexical-heavy
    # fusion — the configs that stay strong when the dense encoder is weak
    from youtu_rag_tpu.core.types import RetrievalResult

    async def bm25_fn(query, filters, top_k):
        hits = await kb.store.lexical_search(query, top_k=top_k, filters=filters)
        return [
            RetrievalResult(chunk=c, score=s, rank=i + 1)
            for i, (c, s) in enumerate(hits)
        ]

    niah["bm25_corpus"] = await RetrievalBenchmark(
        kb, top_k=15, retrieve_fn=bm25_fn
    ).run(RetrievalBenchmark.load_qrels(qrels_p))

    from youtu_rag_tpu.retrieval.retriever import HybridRetriever

    lex_heavy = HybridRetriever(
        kb.store,
        kb.embedder,
        kb.config.retriever.model_copy(update={"hybrid_alpha": 0.25}),
    )

    async def lex_heavy_fn(query, filters, top_k):
        return await lex_heavy.retrieve(query, top_k=top_k, filters=filters)

    niah["hybrid_lex_heavy"] = await RetrievalBenchmark(
        kb, top_k=15, retrieve_fn=lex_heavy_fn
    ).run(RetrievalBenchmark.load_qrels(qrels_p))
    report["datasets"]["niah"] = {"queries": len(samples), **{k: _trim(v) for k, v in niah.items()}}

    # --- factguard ---
    docs_p, qrels_p = fixtures["factguard"]
    fg = {}
    kbf = await build_kb("factguard_naive", docs_p, args.provider, args.pretrained)
    # the reference's baseline ladder: recall grows with naive top-k
    # (README.md FactGuard rows top3/5/10/15)
    for kk in (3, 5, 15):
        fg[f"naive_top{kk}"] = await RetrievalBenchmark(kbf, top_k=kk).run(
            RetrievalBenchmark.load_qrels(qrels_p)
        )
    kbf2 = await build_kb(
        "factguard_rerank", docs_p, args.provider, args.pretrained, reranker="lexical"
    )
    fg["kb_search_rerank"] = await RetrievalBenchmark(kbf2, top_k=15).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    fg["hybrid_rrf"] = await RetrievalBenchmark(kbf, top_k=15, use_hybrid=True).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    fg["hybrid_rerank"] = await RetrievalBenchmark(kbf2, top_k=15, use_hybrid=True).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    fg["hybrid_alpha_sweep"] = await _alpha_sweep(kbf, qrels_p)
    report["datasets"]["factguard"] = {
        "queries": len(RetrievalBenchmark.load_qrels(qrels_p)),
        **{k: _trim(v) for k, v in fg.items()},
    }

    # --- timeliness ---
    docs_p, qrels_p = fixtures["timeliness"]
    kb3 = await build_kb("timeliness", docs_p, args.provider, args.pretrained)
    plain = [
        {"query": s.query, "relevant": sorted(s.relevant)}
        for s in RetrievalBenchmark.load_qrels(qrels_p)
    ]
    t = {}
    t["dense_no_filters"] = await RetrievalBenchmark(kb3, top_k=15).run(
        RetrievalBenchmark.load_qrels(plain)
    )
    t["dense_time_filters"] = await RetrievalBenchmark(kb3, top_k=15).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    report["datasets"]["timeliness"] = {
        "queries": len(plain), **{k: _trim(v) for k, v in t.items()}
    }

    # --- popularity preference ---
    from youtu_rag_tpu.tools.meta_retrieval import MetaRetrievalToolkit

    docs_p, qrels_p = fixtures["popularity"]
    kb4 = await build_kb("popularity", docs_p, args.provider, args.pretrained)
    pop = {}
    pop["dense_naive"] = await RetrievalBenchmark(kb4, top_k=15).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )
    toolkit = MetaRetrievalToolkit({"kb": kb4})

    async def pref_fn(query, filters, top_k):
        return await toolkit.search_with_preference(
            query, top_k=top_k, filters=filters, preference="popularity"
        )

    pop["popularity_blend"] = await RetrievalBenchmark(
        kb4, top_k=15, retrieve_fn=pref_fn
    ).run(RetrievalBenchmark.load_qrels(qrels_p))
    n_pop = len(RetrievalBenchmark.load_qrels(qrels_p))
    report["datasets"]["popularity"] = {
        "queries": n_pop, **{k: _trim(v) for k, v in pop.items()}
    }

    # --- paraphrase (zero lexical overlap: the contextual-channel probe) ---
    docs_p, qrels_p = fixtures["paraphrase"]
    kb5 = await build_kb("paraphrase", docs_p, args.provider, args.pretrained)
    para = {}
    para["naive_top15"] = await RetrievalBenchmark(kb5, top_k=15).run(
        RetrievalBenchmark.load_qrels(qrels_p)
    )

    async def bm25_para_fn(query, filters, top_k):
        hits = await kb5.store.lexical_search(query, top_k=top_k, filters=filters)
        return [
            RetrievalResult(chunk=c, score=s, rank=i + 1)
            for i, (c, s) in enumerate(hits)
        ]

    para["bm25_corpus"] = await RetrievalBenchmark(
        kb5, top_k=15, retrieve_fn=bm25_para_fn
    ).run(RetrievalBenchmark.load_qrels(qrels_p))
    if args.provider == "tpu" and getattr(build_kb, "_npz", None):
        # gate-forced ablations: contextual-only is the row that proves the
        # transformer half (BM25/hash/lexical-only sit at chance here)
        kb_ctx = await build_kb(
            "paraphrase_ctx", docs_p, args.provider, args.pretrained, lex_gate=0.0
        )
        para["contextual_only"] = await RetrievalBenchmark(kb_ctx, top_k=15).run(
            RetrievalBenchmark.load_qrels(qrels_p)
        )
        kb_lex = await build_kb(
            "paraphrase_lex", docs_p, args.provider, args.pretrained, lex_gate=1.0
        )
        para["lexical_only"] = await RetrievalBenchmark(kb_lex, top_k=15).run(
            RetrievalBenchmark.load_qrels(qrels_p)
        )
    report["datasets"]["paraphrase"] = {
        "queries": len(RetrievalBenchmark.load_qrels(qrels_p)),
        **{k: _trim(v) for k, v in para.items()},
    }
    return report


async def _alpha_sweep(kb, qrels_p, alphas=(0.25, 0.5, 0.75)) -> dict:
    """Recall/NDCG across the dense↔lexical fusion weight (VERDICT item 4)."""
    from youtu_rag_tpu.eval.retrieval_eval import RetrievalBenchmark
    from youtu_rag_tpu.retrieval.retriever import HybridRetriever

    out = {}
    for alpha in alphas:
        r = HybridRetriever(
            kb.store, kb.embedder,
            kb.config.retriever.model_copy(update={"hybrid_alpha": alpha}),
        )

        async def fn(query, filters, top_k, _r=r):
            return await _r.retrieve(query, top_k=top_k, filters=filters)

        m = await RetrievalBenchmark(kb, top_k=15, retrieve_fn=fn).run(
            RetrievalBenchmark.load_qrels(qrels_p)
        )
        out[f"alpha_{alpha}"] = {
            "recall_at_all": round(m["recall_at_all"], 4),
            "ndcg_w_at_5": round(m["ndcg_w_at_5"], 4),
        }
    return out


def _trim(m: dict) -> dict:
    return {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in m.items()
        if k not in ("samples", "top_k")
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--provider", default="hash", choices=["hash", "tpu"])
    p.add_argument("--pretrained", default=None, help="pretrained checkpoint dir for --provider tpu")
    p.add_argument(
        "--npz", default=None,
        help="trained encoder weights (train_embedder output) for --provider tpu",
    )
    p.add_argument("--encoder-preset", default="tiny", choices=["tiny", "small", "base"],
                   help="EncoderConfig preset matching the --npz weights")
    p.add_argument("--regen", action="store_true", help="regenerate fixture data")
    args = p.parse_args()

    build_kb._npz = args.npz  # bench-local plumbing (see build_kb)
    build_kb._preset = args.encoder_preset
    report = asyncio.run(run_all(args))
    if args.npz:
        report["encoder_npz"] = args.npz
    from youtu_rag_tpu.utils.provenance import run_provenance

    report.update(run_provenance(seed=7))
    print(json.dumps(report))
    suffix = "" if args.provider == "hash" else f"_{args.provider}"
    out = os.path.join(os.path.dirname(DATA_DIR), f"quality_report{suffix}.json")
    with open(out, "w") as f:
        f.write(json.dumps(report, indent=1) + "\n")
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
