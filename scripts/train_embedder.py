#!/usr/bin/env python
"""Finetune the TPU encoder on a corpus or query-positive pairs.

The reference delegates embeddings to remote services, so it has no
training story; this build owns its encoder (models/encoder.py) and this
script is the end-to-end finetune pipeline on top of models/train.py:

  data        --pairs pairs.jsonl   lines of {"query", "positive"}
              --corpus DIR          self-supervised ICT pairs: for every
                                    chunk, query = a random contiguous
                                    sentence span, positive = the chunk
                                    with the span removed
  step        dp x tp sharded InfoNCE train step (make_sharded_train_step)
              on >1 device, plain jitted step on one
  checkpoints orbax via TrainCheckpointer (resume with --resume)
  eval        recall@1/@5 of query -> positive over a holdout split,
              before vs after
  output      <out>/encoder_params.npz — load with
              TpuEmbedder(params=load_params_npz(...))

    python scripts/train_embedder.py --corpus ./docs --steps 200 --out /tmp/ft
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/train_embedder.py --pairs pairs.jsonl --dp 4 --tp 2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import random
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# -- data ---------------------------------------------------------------


def load_pairs(path: Path) -> list[tuple[str, str]]:
    pairs = []
    for line in path.read_text().strip().splitlines():
        if not line.strip():
            continue
        d = json.loads(line)
        q = d.get("query") or d.get("question")
        p = d.get("positive") or d.get("document") or d.get("answer")
        if q and p:
            pairs.append((q, p))
    return pairs


def group_pairs(pairs: list[tuple[str, str]], start: int) -> list[tuple[str, str, int]]:
    """Tag ungrouped pairs with singleton group ids (group-aware batching)."""
    return [(q, p, start + i) for i, (q, p) in enumerate(pairs)]


def ict_pairs_from_corpus(corpus: Path, chunk_size: int, seed: int) -> list[tuple[str, str]]:
    """Inverse-cloze-task pairs: a sentence span queries its source chunk."""
    from youtu_rag_tpu.core.config import ChunkingConfig
    from youtu_rag_tpu.ingest.chunker import RecursiveTextSplitter

    rng = random.Random(seed)
    splitter = RecursiveTextSplitter(
        ChunkingConfig(strategy="recursive", chunk_size=chunk_size, chunk_overlap=0)
    )
    pairs: list[tuple[str, str]] = []
    exts = {".md", ".txt", ".rst", ".py"}
    for f in sorted(corpus.rglob("*")):
        if not (f.is_file() and f.suffix in exts):
            continue
        try:
            text = f.read_text(errors="ignore")
        except OSError:
            continue
        for chunk in splitter.split_text(text):
            sents = [s for s in re.split(r"(?<=[.!?\n])\s+", chunk) if len(s.split()) >= 3]
            if len(sents) < 2:
                continue
            qi = rng.randrange(len(sents))
            query = sents[qi]
            positive = " ".join(sents[:qi] + sents[qi + 1 :])
            pairs.append((query, positive))
    rng.shuffle(pairs)
    return pairs


def make_batches(pairs, tokenizer, batch: int, seqlen: int, steps: int, seed: int):
    """Yield `steps` batches cycling over the pairs with reshuffles.

    Pairs are (query, positive, group): shuffling happens at *group*
    granularity with members kept adjacent, so sibling hard negatives
    (models/data_synth.py) land in the same InfoNCE batch."""
    rng = random.Random(seed)
    pairs = [t if len(t) == 3 else (t[0], t[1], -1 - i) for i, t in enumerate(pairs)]
    by_group: dict[int, list[int]] = {}
    for i, (_, _, g) in enumerate(pairs):
        by_group.setdefault(g, []).append(i)
    groups = list(by_group.values())
    order: list[int] = []
    enc_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def encode(i: int):
        if i not in enc_cache:
            q, p, _ = pairs[i]
            enc_cache[i] = (
                np.asarray(tokenizer.encode(q)[:seqlen], np.int32),
                np.asarray(tokenizer.encode(p)[:seqlen], np.int32),
            )
        return enc_cache[i]

    pos = 0
    for _ in range(steps):
        take = []
        while len(take) < batch:
            if pos == 0:
                rng.shuffle(groups)
                order = [i for g in groups for i in g]
            take.append(order[pos])
            pos = (pos + 1) % len(order)
        b = {
            "q_ids": np.zeros((batch, seqlen), np.int32),
            "q_mask": np.zeros((batch, seqlen), np.float32),
            "d_ids": np.zeros((batch, seqlen), np.int32),
            "d_mask": np.zeros((batch, seqlen), np.float32),
        }
        for j, i in enumerate(take):
            qt, dt = encode(i)
            b["q_ids"][j, : len(qt)] = qt
            b["q_mask"][j, : len(qt)] = 1.0
            b["d_ids"][j, : len(dt)] = dt
            b["d_mask"][j, : len(dt)] = 1.0
        yield b


def _idf_tok_weight(train_pairs, tokenizer, vocab_size: int):
    """IDF over positives → inverse-softplus init for encoder tok_weight."""
    import jax.numpy as jnp

    df = np.zeros(vocab_size, np.float64)
    docs = [p for _, p, _ in train_pairs][:20000]
    for text in docs:
        for tid in set(tokenizer.tokenize(text)):
            if 0 <= tid < vocab_size:
                df[tid] += 1
    idf = np.maximum(np.log((len(docs) + 1) / (df + 1.0)), 0.05)
    return jnp.asarray(np.log(np.expm1(idf)), jnp.float32)


# -- eval ---------------------------------------------------------------


def eval_recall(params, cfg, holdout, batch_size: int = 64, tokenizer=None) -> dict:
    """recall@1/@5 of query -> its positive among all holdout positives."""
    from youtu_rag_tpu.models.embedder import TpuEmbedder

    emb = TpuEmbedder(config=cfg, params=params, batch_size=batch_size, tokenizer=tokenizer)
    q_vecs = np.asarray(emb.embed_batch([t[0] for t in holdout]), np.float32)
    d_vecs = np.asarray(emb.embed_batch([t[1] for t in holdout]), np.float32)
    scores = q_vecs @ d_vecs.T
    ranks = (scores > np.diag(scores)[:, None]).sum(axis=1)  # 0 = best
    return {
        "n": len(holdout),
        "recall@1": round(float((ranks == 0).mean()), 4),
        "recall@5": round(float((ranks < 5).mean()), 4),
    }


# -- main ---------------------------------------------------------------


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=Path, help="jsonl of {query, positive}")
    p.add_argument("--corpus", type=Path, help="directory for ICT self-supervision")
    p.add_argument("--out", type=Path, default=Path("/tmp/yrt_finetune"))
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seqlen", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--dp", type=int, default=0, help="data-parallel shards (0 = all devices)")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel shards")
    p.add_argument("--preset", choices=["tiny", "small", "base"], default="base")
    p.add_argument(
        "--pretrained", type=Path, default=None,
        help="HF BERT-family checkpoint dir (models/pretrained.py) to "
        "fine-tune instead of random init; overrides --preset and "
        "switches to the WordPiece tokenizer",
    )
    p.add_argument("--holdout", type=int, default=128)
    p.add_argument("--ckpt-every", type=int, default=100)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--synthetic", type=int, default=0, metavar="GROUPS",
        help="add GROUPS sibling groups of identifier-grounding pairs "
        "(models/data_synth.py) — hard in-batch negatives that teach "
        "exact-identifier retrieval",
    )
    p.add_argument("--siblings", type=int, default=4, help="pairs per synthetic group")
    p.add_argument(
        "--paraphrase", type=int, default=0, metavar="PAIRS",
        help="add PAIRS zero-lexical-overlap paraphrase pairs "
        "(models/paraphrase_synth.py, canonical seed) — supervision for the "
        "CONTEXTUAL channel: queries share no tokens with their positives, "
        "so only the transformer half can align them",
    )
    p.add_argument(
        "--wordpiece", action="store_true",
        help="train a WordPiece/BPE vocab from the training texts and use "
        "it instead of the hashing tokenizer (identifiers decompose into "
        "trained subwords); saves vocab.txt next to the weights",
    )
    p.add_argument("--vocab-size", type=int, default=8192)
    p.add_argument(
        "--lex-pool", action="store_true",
        help="enable the encoder's lexical residual pathway "
        "(EncoderConfig.lex_pool) with IDF-initialized token weights",
    )
    p.add_argument(
        "--lex-buckets", type=int, default=0,
        help="with --lex-pool: size of the sparse hashed-BOW channel "
        "concatenated onto the embedding (0 = dense projection variant)",
    )
    args = p.parse_args()

    import jax

    from youtu_rag_tpu.models.checkpoint import TrainCheckpointer
    from youtu_rag_tpu.models.encoder import (
        EncoderConfig,
        count_params,
        init_encoder_params,
        save_params_npz,
    )
    from youtu_rag_tpu.models.tokenizer import HashTokenizer
    from youtu_rag_tpu.models.train import TrainConfig, make_optimizer, make_train_step

    sizes = {
        "tiny": dict(d_model=128, n_layers=2, n_heads=2, d_ff=512, out_dim=128),
        "small": dict(d_model=384, n_layers=6, n_heads=6, d_ff=1536, out_dim=384),
        "base": dict(d_model=768, n_layers=12, n_heads=12, d_ff=3072, out_dim=768),
    }
    pairs: list[tuple[str, str, int]] = []
    if args.pairs:
        pairs += group_pairs(load_pairs(args.pairs), start=1_000_000)
    if args.corpus:
        pairs += group_pairs(
            ict_pairs_from_corpus(args.corpus, chunk_size=800, seed=args.seed),
            start=2_000_000,
        )
    if args.synthetic:
        from youtu_rag_tpu.models.data_synth import gen_identifier_pairs

        pairs += [
            (d["query"], d["positive"], d["group"])
            for d in gen_identifier_pairs(args.synthetic, args.siblings, seed=args.seed)
        ]
    if args.paraphrase:
        from youtu_rag_tpu.models.paraphrase_synth import TRAIN_SEED, gen_paraphrase_pairs

        # canonical seed, NOT args.seed: the bench fixture holds out exactly
        # these combinations (paraphrase_synth.TRAIN_SEED contract)
        para, _ = gen_paraphrase_pairs(args.paraphrase, seed=TRAIN_SEED)
        pairs += group_pairs([(d["query"], d["positive"]) for d in para], start=3_000_000)
    if len(pairs) < 2:
        sys.exit("need at least 2 training pairs (--pairs/--corpus/--synthetic)")

    # holdout: spread across sources (tail after a deterministic shuffle at
    # group granularity so sibling groups never straddle the split)
    rng = random.Random(args.seed + 99)
    by_group: dict[int, list] = {}
    for t in pairs:
        by_group.setdefault(t[2], []).append(t)
    groups = list(by_group.values())
    rng.shuffle(groups)
    flat = [t for g in groups for t in g]
    n_hold = min(args.holdout, len(flat) // 5)
    holdout, train_pairs = flat[:n_hold], flat[n_hold:] or flat
    print(f"pairs: {len(train_pairs)} train, {len(holdout)} holdout; params preset {args.preset}")

    pre_params = None
    pre_tokenizer = None
    wp_vocab = None
    if args.pretrained:
        from youtu_rag_tpu.models.pretrained import load_pretrained_encoder

        import jax.numpy as jnp

        pre_params, cfg, pre_tokenizer = load_pretrained_encoder(
            args.pretrained, dtype=jnp.float32, max_len=max(args.seqlen, 16)
        )
        print(f"fine-tuning pretrained checkpoint {args.pretrained}")
    else:
        size = dict(sizes[args.preset])
        if args.wordpiece:
            from youtu_rag_tpu.models.wordpiece import build_wordpiece_vocab

            texts = [t[0] for t in train_pairs] + [t[1] for t in train_pairs]
            t0 = time.perf_counter()
            wp_vocab = build_wordpiece_vocab(texts, vocab_size=args.vocab_size)
            print(
                f"wordpiece vocab: {len(wp_vocab)} tokens from "
                f"{len(texts)} texts ({time.perf_counter() - t0:.1f}s)"
            )
            size["vocab_size"] = len(wp_vocab)
        cfg = EncoderConfig(
            max_len=max(args.seqlen, 16), lex_pool=args.lex_pool,
            lex_buckets=args.lex_buckets, **size
        )
    tc = TrainConfig(
        learning_rate=args.lr,
        warmup_steps=min(args.warmup, max(args.steps // 2, 1)),
        total_steps=args.steps,
    )

    if args.pretrained:
        tokenizer = pre_tokenizer
    elif wp_vocab is not None:
        from youtu_rag_tpu.models.wordpiece import WordPieceTokenizer

        tokenizer = WordPieceTokenizer(wp_vocab, max_length=cfg.max_len)
    else:
        tokenizer = HashTokenizer(cfg.vocab_size, cfg.max_len)

    init_params0 = pre_params
    if init_params0 is None:
        init_params0 = init_encoder_params(cfg, args.seed)
        if cfg.lex_pool:
            # IDF-initialize the lexical token weights (inverse softplus):
            # ubiquitous tokens (CLS/SEP/stopwords) start near zero
            # influence, unseen/rare identifier subwords start at max —
            # the lexical pathway retrieves well from step 0
            init_params0["tok_weight"] = _idf_tok_weight(
                train_pairs, tokenizer, cfg.vocab_size
            )

    n_dev = len(jax.devices())
    dp = args.dp or max(n_dev // args.tp, 1)
    use_mesh = dp * args.tp > 1
    if use_mesh:
        from youtu_rag_tpu.models.train import make_sharded_train_step
        from youtu_rag_tpu.parallel.mesh import get_mesh

        mesh = get_mesh({"dp": dp, "tp": args.tp})
        params, opt_state, step_fn = make_sharded_train_step(
            cfg, tc, mesh, seed=args.seed, init_params=init_params0
        )
        print(f"mesh: dp={dp} tp={args.tp} over {n_dev} devices")
    else:
        optimizer = make_optimizer(tc)
        params = init_params0
        opt_state = optimizer.init(params)
        step_fn = jax.jit(make_train_step(cfg, tc, optimizer))
    print(f"encoder: {count_params(params) / 1e6:.1f}M params")
    args.out.mkdir(parents=True, exist_ok=True)
    ckpt = TrainCheckpointer(args.out / "ckpt")
    start = 0
    if args.resume and ckpt.latest_step() is not None:
        start = ckpt.latest_step()
        params, opt_state, _ = ckpt.restore(start, params_like=params, opt_state_like=opt_state)
        print(f"resumed from step {start}")

    before = eval_recall(params, cfg, holdout, tokenizer=tokenizer) if holdout else {}
    if before:
        print(f"recall before: {before}")

    t0 = time.perf_counter()
    metrics = {}
    batches = make_batches(train_pairs, tokenizer, args.batch, args.seqlen,
                           args.steps - start, args.seed + start)
    for step, batch in enumerate(batches, start=start + 1):
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        if step % 20 == 0 or step == args.steps:
            print(
                f"step {step}/{args.steps}  loss {float(metrics['loss']):.4f}  "
                f"acc {float(metrics['accuracy']):.3f}  "
                f"({(time.perf_counter() - t0) / (step - start):.2f}s/step)"
            )
        if step % args.ckpt_every == 0:
            ckpt.save(step, params, opt_state, metadata={"loss": float(metrics["loss"])})
    ckpt.save(args.steps, params, opt_state, metadata={"final": True})
    ckpt.close()

    after = eval_recall(params, cfg, holdout, tokenizer=tokenizer) if holdout else {}
    out_npz = args.out / "encoder_params.npz"
    save_params_npz(jax.device_get(params), out_npz)
    import dataclasses

    from youtu_rag_tpu.models.encoder import save_encoder_config

    # serving config: RoPE (preln arch) is position-table-free, so serve
    # at 512 even when trained on shorter pairs — real chunks run ~250
    # tokens and must not truncate (bert arch keeps its learned table)
    serve_cfg = (
        cfg if cfg.arch == "bert"
        else dataclasses.replace(cfg, max_len=max(cfg.max_len, 512))
    )
    save_encoder_config(serve_cfg, args.out / "encoder_config.json")
    if wp_vocab is not None:
        from youtu_rag_tpu.models.wordpiece import save_vocab

        save_vocab(wp_vocab, args.out / "vocab.txt")
    report = {
        "steps": args.steps,
        "pairs": len(train_pairs),
        "final_loss": float(metrics["loss"]) if metrics else None,
        "recall_before": before,
        "recall_after": after,
        "params_npz": str(out_npz),
        "provenance": {
            "preset": args.preset,
            "seed": args.seed,
            "lr": args.lr,
            "batch": args.batch,
            "seqlen": args.seqlen,
            "corpus": str(args.corpus) if args.corpus else None,
            "pairs_file": str(args.pairs) if args.pairs else None,
            "synthetic_groups": args.synthetic,
            "siblings": args.siblings,
            "paraphrase_pairs": args.paraphrase,
            "wordpiece_vocab": len(wp_vocab) if wp_vocab else None,
            "lex_pool": bool(getattr(cfg, "lex_pool", False)),
            "lex_buckets": int(getattr(cfg, "lex_buckets", 0)),
        },
    }
    (args.out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
