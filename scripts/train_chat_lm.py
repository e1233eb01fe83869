#!/usr/bin/env python
"""Train the local chat LM on synthetic ReAct KB-QA trajectories.

The reference requires an external LLM service for every agent turn
(``utu/__init__.py:8``); this script produces the committed in-repo
checkpoint that lets the WHOLE agent loop run in-process on the TPU:

  data        models/lm_synth.py — episodes rendered through the REAL
              serving formatters (ReactChatClient + plain chat template),
              generated on the fly (an infinite stream: the model can
              only learn to COPY question->query and observation->answer,
              never to memorize)
  tokenizer   models/bpe.train_bpe fitted to the episode distribution
              (the ReAct scaffolding collapses into a few merged tokens)
  model       models/decoder.py llama arch (RMSNorm/RoPE/SiLU), trained
              with masked-completion CE (models/train_lm.py)
  eval        held-out episodes, greedy generate:
                turn1: Action parses (parse_react) + query == question
                turn2: Final Answer == gold value (exact match)
  output      <out>/decoder_params.npz + decoder_config.json +
              tokenizer.json + train_report.json — served via
              LocalChatClient(weights_dir=<out>) / cli_chat --llm-weights-dir

    python scripts/train_chat_lm.py --steps 4000 --out benchmarks/models/yrt_tiny_chat
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--vocab-size", type=int, default=2048)
    p.add_argument("--max-len", type=int, default=0, help="0 = auto (p99 pow2)")
    p.add_argument("--d-model", type=int, default=192)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--d-ff", type=int, default=768)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-episodes", type=int, default=64)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--tokenizer-episodes", type=int, default=400)
    p.add_argument("--out", type=Path, default=Path("/tmp/yrt_chat_lm"))
    return p.parse_args()


def batch_stream(tools, tokenizer, max_len, eos_id, batch, seed):
    """Infinite (freshly synthesized) training batches."""
    from youtu_rag_tpu.models.lm_synth import render_episode_samples, synth_episode
    from youtu_rag_tpu.models.train_lm import encode_samples, pack_batch

    rng = random.Random(seed + 1)
    while True:
        samples = []
        while len(samples) < batch:
            ep = synth_episode(rng)
            samples.extend(render_episode_samples(ep, tools))
        enc = encode_samples(samples[:batch], tokenizer, max_len, eos_id)
        yield pack_batch(enc, max_len, pad_id=eos_id)


def evaluate(params, cfg, tokenizer, tools, episodes, max_len):
    """Greedy decode on held-out episodes → format/copy/answer accuracy."""
    import jax.numpy as jnp

    from youtu_rag_tpu.agents.react import parse_react
    from youtu_rag_tpu.models.decoder import generate, left_pad_batch
    from youtu_rag_tpu.models.lm_synth import render_episode_samples

    import jax

    def gen_batch(prompts, max_new):
        ids = [tokenizer.encode(p)[-(cfg.max_len - max_new):] for p in prompts]
        toks, mask = left_pad_batch(ids, pad_id=cfg.eos_token_id)
        out, lengths = generate(
            params, jnp.asarray(toks), jnp.asarray(mask),
            jax.random.PRNGKey(0), cfg=cfg, max_new_tokens=max_new,
        )
        out = np.asarray(out)
        lengths = np.asarray(lengths)
        return [
            tokenizer.decode(list(out[i, : lengths[i]])) for i in range(len(prompts))
        ]

    t1_prompts, t2_prompts = [], []
    for ep in episodes:
        (p1, _), (p2, _) = render_episode_samples(ep, tools)
        t1_prompts.append(p1)
        t2_prompts.append(p2)

    n = len(episodes)
    action_ok = query_ok = answer_ok = answer_sub = 0
    B = 16
    t1_texts, t2_texts = [], []
    for i in range(0, n, B):
        t1_texts += gen_batch(t1_prompts[i : i + B], max_new=64)
        # turn 2 emits the copy-then-extract chain (quoted gold sentence
        # + Final Answer) — needs more room than the bare answer did
        t2_texts += gen_batch(t2_prompts[i : i + B], max_new=128)
    for ep, txt1, txt2 in zip(episodes, t1_texts, t2_texts):
        _, calls, final = parse_react(txt1)
        if calls and calls[0].name == "kb_embedding_search" and final is None:
            action_ok += 1
            try:
                q = json.loads(calls[0].arguments).get("query", "")
            except json.JSONDecodeError:
                q = ""
            if q.strip() == (ep.query or ep.question).strip():
                query_ok += 1
        _, _, final2 = parse_react(txt2)
        if final2 is not None and final2.strip() == ep.answer.strip():
            answer_ok += 1
        if ep.answer in txt2:
            answer_sub += 1
    return {
        "episodes": n,
        "action_valid": round(action_ok / n, 4),
        "query_exact": round(query_ok / n, 4),
        "answer_exact": round(answer_ok / n, 4),
        "answer_substring": round(answer_sub / n, 4),
        "sample_turn1": t1_texts[0],
        "sample_turn2": t2_texts[0],
    }


def main() -> None:
    args = parse_args()
    t_start = time.time()

    import jax
    import jax.numpy as jnp

    from youtu_rag_tpu.models.bpe import train_bpe
    from youtu_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
        save_decoder_config,
    )
    from youtu_rag_tpu.models.encoder import count_params, save_params_npz
    from youtu_rag_tpu.models.lm_synth import (
        _tool_schemas,
        render_episode_samples,
        synth_corpus,
        synth_episode,
    )
    from youtu_rag_tpu.models.train_lm import (
        LMTrainConfig,
        encode_samples,
        make_lm_optimizer,
        make_lm_train_step,
        pack_batch,
    )

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", file=sys.stderr, flush=True)

    # ---- tokenizer fitted to the episode distribution --------------------
    tok_samples, _ = synth_corpus(args.tokenizer_episodes, seed=args.seed + 7)
    texts = [p + t for p, t in tok_samples]
    print(f"training BPE vocab={args.vocab_size} on {len(texts)} texts ...",
          file=sys.stderr, flush=True)
    tokenizer = train_bpe(texts, vocab_size=args.vocab_size)
    eos_id = tokenizer.eos_id
    assert eos_id is not None

    tools = _tool_schemas()

    # ---- pick max_len from the tokenized p99 (pow2) -----------------------
    if args.max_len:
        max_len = args.max_len
    else:
        lens = [len(tokenizer.encode(p)) + len(tokenizer.encode(t)) + 1
                for p, t in tok_samples]
        p99 = int(np.percentile(lens, 99))
        max_len = 1 << (p99 - 1).bit_length()
        print(f"token lens: p50={int(np.percentile(lens,50))} p99={p99} "
              f"-> max_len {max_len}", file=sys.stderr, flush=True)

    vocab = tokenizer.vocab_size
    vocab_padded = (vocab + 127) // 128 * 128  # MXU lane tiling
    cfg = DecoderConfig(
        vocab_size=vocab_padded,
        d_model=args.d_model,
        n_layers=args.layers,
        n_heads=args.heads,
        n_kv_heads=args.heads,
        d_ff=args.d_ff,
        max_len=max_len,
        arch="llama",
        dtype=jnp.bfloat16,
        eos_token_id=eos_id,
    )
    params = init_decoder_params(cfg, seed=args.seed)
    print(f"model: L={cfg.n_layers} D={cfg.d_model} vocab={vocab_padded} "
          f"T={max_len} params={count_params(params):,}",
          file=sys.stderr, flush=True)

    tc = LMTrainConfig(
        learning_rate=args.lr,
        warmup_steps=min(args.warmup, max(1, args.steps // 10)),
        total_steps=args.steps,
    )
    optimizer = make_lm_optimizer(tc)
    opt_state = optimizer.init(params)
    train_step = make_lm_train_step(cfg, tc, optimizer)

    # ---- held-out eval episodes (disjoint seed) ---------------------------
    eval_rng = random.Random(args.seed + 104729)
    eval_episodes = [synth_episode(eval_rng) for _ in range(args.eval_episodes)]

    stream = batch_stream(tools, tokenizer, max_len, eos_id, args.batch, args.seed)
    losses = []
    report = {"platform": platform, "steps": args.steps, "batch": args.batch,
              "max_len": max_len, "vocab": vocab_padded,
              "params": count_params(params), "evals": []}
    t0 = time.time()
    for step in range(1, args.steps + 1):
        batch = {k: jnp.asarray(v) for k, v in next(stream).items()}
        params, opt_state, metrics = train_step(params, opt_state, batch)
        if step % 100 == 0 or step == 1:
            loss = float(metrics["loss"])
            losses.append([step, round(loss, 4)])
            dt = time.time() - t0
            print(f"step {step}/{args.steps} loss {loss:.4f} "
                  f"({step / dt:.1f} steps/s)", file=sys.stderr, flush=True)
        if step % args.eval_every == 0 or step == args.steps:
            ev = evaluate(params, cfg, tokenizer, tools, eval_episodes, max_len)
            ev["step"] = step
            report["evals"].append(ev)
            print(f"eval@{step}: action {ev['action_valid']:.2f} "
                  f"query {ev['query_exact']:.2f} answer {ev['answer_exact']:.2f} "
                  f"(sub {ev['answer_substring']:.2f})",
                  file=sys.stderr, flush=True)

    report["loss_curve"] = losses
    report["train_minutes"] = round((time.time() - t_start) / 60, 1)

    # ---- save native checkpoint (f16 weights halve the committed size) ----
    args.out.mkdir(parents=True, exist_ok=True)
    params_f16 = jax.tree.map(lambda v: np.asarray(v, np.float16), params)
    save_params_npz(params_f16, args.out / "decoder_params.npz")
    save_decoder_config(cfg, args.out / "decoder_config.json")
    tokenizer.save_json(args.out / "tokenizer.json")
    with open(args.out / "train_report.json", "w") as f:
        json.dump(report, f, indent=1)
    final = report["evals"][-1] if report["evals"] else {}
    print(json.dumps({
        "out": str(args.out), "params": report["params"],
        "final_loss": losses[-1][1] if losses else None,
        "action_valid": final.get("action_valid"),
        "query_exact": final.get("query_exact"),
        "answer_exact": final.get("answer_exact"),
        "train_minutes": report["train_minutes"],
    }))


if __name__ == "__main__":
    main()
