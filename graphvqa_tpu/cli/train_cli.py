"""Training / evaluation driver CLI.

Mirror of the reference's four near-identical ``mainExplain_*.py`` drivers
(mainExplain_gat.py:59-122,146-384) collapsed into one entry point with a
``--model {gat,gcn,gine,lcgn,onlysg}`` switch.

    python -m graphvqa_tpu.cli.train_cli --model gat \
        --data-root /path/to/GraphVQA --split train_balanced \
        --epochs 200 --batch-size 200 --lr 1e-4 --lr-drop 90

    python -m graphvqa_tpu.cli.train_cli --model gat --evaluate \
        --resume outputdir/ckpt --split val_balanced --dump-result
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import pathlib
import random
import sys

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("GraphVQA-TPU training and evaluation",
                                add_help=False)
    p.add_argument("--model", default="gat",
                   choices=["gat", "gcn", "gine", "lcgn", "onlysg"])
    p.add_argument("--data-root", type=str, required=True,
                   help="directory with questions/*_programs.json and "
                        "sceneGraphs/*_sceneGraphs.json")
    p.add_argument("--split", default="train_balanced")
    p.add_argument("--val-split", default="val_balanced")
    p.add_argument("--epochs", default=200, type=int)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("--batch-size", default=200, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr-drop", default=90, type=int)
    p.add_argument("--wd", "--weight-decay", default=0.0, type=float,
                   dest="weight_decay")
    p.add_argument("--clip-grad", default=0.0, type=float, metavar="NORM",
                   help="global gradient-norm clip before Adam (0 = off, "
                        "the reference behavior)")
    p.add_argument("-j", "--workers", default=0, type=int,
                   help="batch-collate worker processes (the reference "
                        "DataLoader's -j, mainExplain_gat.py:201-209); "
                        "0 (default) = in-process, which sustains ~26k "
                        "QA/s (3x the device step) after the dataset "
                        "prewarm fills the text-id/graph caches "
                        "(tools/bench_input_pipeline.py); raise only if "
                        "collate measurably outweighs the step")
    p.add_argument("--size-bucket", default=16, type=int, metavar="W",
                   help="training batches are cut from windows of W*batch "
                        "shuffled samples locally sorted by scene size, so "
                        "one big graph bumps few batches to a larger static "
                        "shape instead of most of them (data/dataset.py "
                        "size bucketing); 0 disables")
    p.add_argument("--print-freq", default=100, type=int)
    p.add_argument("--resume", default="", help="checkpoint dir to resume from")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--evaluate-sets", "--evaluate_sets", default=None,
                   nargs="+", dest="evaluate_sets",
                   help="evaluate these splits (mainExplain_gat.py:99 "
                        "--evaluate_sets); implies --evaluate")
    p.add_argument("--fast-validate", default=0, type=int, metavar="N",
                   help="FAST_VALIDATE: stop validation after N batches "
                        "(mainExplain_gat.py:675); 0 = full validation")
    p.add_argument("--validate-every", default=5, type=int,
                   help="validate every N epochs (mainExplain_gat.py:359)")
    p.add_argument("--dump-result", action="store_true")
    p.add_argument("--dump-attentions", action="store_true",
                   help="also dump object-based attention maps for the "
                        "official grounding metric (eval.py:82,160-165)")
    p.add_argument("--glove", default="",
                   help="GloVe file (.txt glove.6B.300d format, or a cached "
                        ".npy matrix) injected into the shared text embedding "
                        "at init (pipeline_model_gat.py:633-634)")
    p.add_argument("--glove-allow-missing", action="store_true",
                   help="proceed with zero-injected embeddings when --glove "
                        "points at a nonexistent file (default: error)")
    p.add_argument("--glove-sg", action="store_true",
                   help="also inject GloVe into the scene-graph embedding "
                        "(the reference builds SG vectors too, "
                        "gqa_dataset_entry.py:162, but its model-side copy is "
                        "commented out, pipeline_model_gat.py:563)")
    p.add_argument("--seed", default=1234, type=int)
    p.add_argument("--output_dir", "--output-dir", default="./outputdir",
                   dest="output_dir")
    p.add_argument("--layout", default="dense",
                   choices=["dense", "flat"],
                   help="graph aggregation layout (see BatchConfig.layout)")
    p.add_argument("--nodes-per-graph", default=64, type=int,
                   help="dense layout: uniform per-graph node padding")
    p.add_argument("--edges-per-graph", default=256, type=int,
                   help="dense layout: uniform per-graph edge padding")
    p.add_argument("--nodes-pad", default=8192, type=int)
    p.add_argument("--edges-pad", default=65536, type=int)
    p.add_argument("--question-len", default=32, type=int)
    p.add_argument("--program-len", default=16, type=int)
    p.add_argument("--full-answer-len", default=20, type=int)
    p.add_argument("--data-parallel", default=1, type=int,
                   help="number of data shards (devices) for DP training")
    p.add_argument("--edge-parallel", default=1, type=int,
                   help="edge shards per data shard (graph-domain context "
                        "parallelism, SURVEY.md §5): every graph's edges are "
                        "partitioned by destination ownership across this "
                        "many devices (parallel/edge_sharded.py). Requires "
                        "the dense layout and nodes-per-graph divisible by "
                        "it; total devices = data-parallel x edge-parallel")
    p.add_argument("--steps-per-dispatch", default=1, type=int, metavar="K",
                   help="run K optimizer steps per device dispatch (one "
                        "lax.scan over K stacked batches): amortizes "
                        "per-step host dispatch latency; semantically K "
                        "single steps. Composes with --data-parallel/"
                        "--edge-parallel (the scan wraps the mesh step)")
    p.add_argument("--program-loss", default="default",
                   choices=["default", "on", "off"],
                   help="override the model config's program-CE loss term: "
                        "the reference GAT driver trains with short-answer "
                        "CE + 0*programs (mainExplain_gat.py:542) while the "
                        "gcn/gine/lcgn drivers add program CE "
                        "(mainExplain_gcn.py:523,540); 'on' applies the "
                        "latter recipe to any model")
    p.add_argument("--rounds", default=None, type=int,
                   help="engine message-passing rounds (default: the model "
                        "config's, 5 — the reference hardcodes 5, "
                        "pipeline_model_gat.py:683-687)")
    p.add_argument("--use-execution-engine", action="store_true",
                   help="build the recurrent execution engine + bitmap head "
                        "(C17) and train its BCE against the GT execution "
                        "bitmap (mainExplain_gat.py:325,504)")
    p.add_argument("--compile-cache", default="", metavar="DIR",
                   help="persistent XLA compilation cache directory: repeat "
                        "runs skip the multi-minute first-epoch compiles "
                        "(jax_compilation_cache_dir; effective on TPU)")
    p.add_argument("--profile-dir", default="",
                   help="capture a jax.profiler trace of a few steps of the "
                        "first epoch into this directory (TensorBoard/XProf)")
    p.add_argument("--dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="compute dtype for transformer/engine matmuls "
                        "(params and optimizer state stay float32); default "
                        "is the model config's dtype — bfloat16, the "
                        "shipping default (see ModelConfig.dtype for the "
                        "accuracy evidence); pass float32 to opt out")
    p.add_argument("--prng", default="rbg", choices=["rbg", "threefry"],
                   help="PRNG for dropout masks: 'rbg' (XLA RngBitGenerator, "
                        "measured 11%% faster train steps — threefry mask "
                        "generation rode every big matmul's fusion) is "
                        "deterministic for a fixed backend/compiler version; "
                        "'threefry' is bit-stable across versions")
    p.add_argument("--dropout", type=float, default=None,
                   help="override every dropout rate (transformer stacks, "
                        "engine attention, classifier head) with one value; "
                        "default keeps the reference rates (0.1 transformer "
                        "/ 0.1 engine / 0.2 classifier, "
                        "pipeline_model_gat.py defaults). Small-data probes "
                        "are dropout-sensitive; --dropout 0 matches the "
                        "tools/ab_torch_reference.py architecture exactly")
    p.add_argument("--tiny", action="store_true",
                   help="debug-scale model dims (CI golden tests / smoke "
                        "runs); same architecture and data path, ~100x fewer "
                        "params")
    return p


def _load_glove(args, text_vocab, sg_vocab, out_dir):
    """Resolve --glove into (text_matrix, sg_matrix) .npy artifacts.

    A .txt GloVe file is scanned once per vocab and the matrices are cached
    next to the checkpoints; rows missing from GloVe stay zero (torchtext
    behavior, gqa_dataset_entry.py:394-398)."""
    import numpy as np

    from graphvqa_tpu.data.vocab import load_glove_matrix

    if not args.glove:
        return None, None
    path = pathlib.Path(args.glove)
    allow_missing = getattr(args, "glove_allow_missing", False)
    if path.suffix == ".npy":
        if not path.exists():
            if not allow_missing:
                raise FileNotFoundError(
                    f"GloVe matrix not found: {path} — pass "
                    f"--glove-allow-missing to proceed with zero embeddings")
            return np.zeros((len(text_vocab), 300), np.float32), None
        text_mat = np.load(path)
        sg_mat = None
        if args.glove_sg:
            sg_path = path.with_name(path.stem + "_sg.npy")
            sg_mat = np.load(sg_path) if sg_path.exists() else None
        return text_mat, sg_mat
    cache = out_dir / "glove_text.npy"
    if cache.exists():
        text_mat = np.load(cache)
    else:
        text_mat = load_glove_matrix(text_vocab, path,
                                     allow_missing=allow_missing)
        np.save(cache, text_mat)
    sg_mat = None
    if args.glove_sg:
        sg_cache = out_dir / "glove_sg.npy"
        if sg_cache.exists():
            sg_mat = np.load(sg_cache)
        else:
            sg_mat = load_glove_matrix(sg_vocab, path,
                                       allow_missing=allow_missing)
            np.save(sg_cache, sg_mat)
    return text_mat, sg_mat


def main(args):
    import os

    import jax
    import jax.numpy as jnp

    # some TPU plugins clobber JAX_PLATFORMS at registration; re-assert the
    # user's explicit choice so `JAX_PLATFORMS=cpu python -m ...train_cli`
    # really runs on CPU
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_prng_impl", args.prng)
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graphvqa_tpu.config import (BatchConfig, CONFIG_FACTORY, Config,
                                     TrainConfig)
    from graphvqa_tpu.data import (GQADataset, build_scene_graph_vocab,
                                   build_text_vocab, tokenize)
    from graphvqa_tpu.data.vocab import Vocab, load_answer_maps
    from graphvqa_tpu.models import PipelineModel
    from graphvqa_tpu.parallel.mesh import maybe_init_distributed
    from graphvqa_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from graphvqa_tpu.train.loop import (make_eval_step, make_train_step,
                                         train_one_epoch, validate)
    from graphvqa_tpu.train.train_state import create_train_state

    maybe_init_distributed()

    # seeding (mainExplain_gat.py:152-166)
    random.seed(args.seed)
    np.random.seed(args.seed)

    out_dir = pathlib.Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if jax.process_index() == 0:
        # force=True: jax/absl may have already attached root handlers, and
        # basicConfig silently no-ops then (no log file would appear)
        logging.basicConfig(
            filename=out_dir / f"log-{args.model}.txt", level=logging.INFO,
            force=True)
        # run provenance header (mainExplain_gat.py:147-150)
        from graphvqa_tpu.train.logging_utils import get_sha
        stamp = f"git: {get_sha()}"
        print(stamp)
        logging.info(stamp)
        logging.info("args: %s", vars(args))

    root = pathlib.Path(args.data_root)

    def programs_path(split):
        return root / "questions" / f"{split}_programs.json"

    def scenes_path(split):
        name = "train" if "train" in split else "val"
        p = root / "sceneGraphs" / f"{name}_sceneGraphs.json"
        return p if p.exists() else None

    sg_vocab = build_scene_graph_vocab()
    vocab_path = out_dir / "text_vocab.json"
    if vocab_path.exists():
        text_vocab = Vocab.load(vocab_path)
    else:
        train_data = json.loads(programs_path(args.split).read_text())
        text_vocab = build_text_vocab(train_data, tokenize)
        if jax.process_index() == 0:
            text_vocab.save(vocab_path)
    print(f"text vocab: {len(text_vocab)} | sg vocab: {len(sg_vocab)}")

    cfg = CONFIG_FACTORY[args.model]()
    model_cfg = dataclasses.replace(
        cfg.model,
        text=dataclasses.replace(cfg.model.text, vocab_size=len(text_vocab)),
        scene=dataclasses.replace(cfg.model.scene, vocab_size=len(sg_vocab)),
        use_execution_engine=args.use_execution_engine,
        **({"dtype": args.dtype} if args.dtype else {}),
    )
    if args.rounds:
        model_cfg = dataclasses.replace(
            model_cfg,
            engine=dataclasses.replace(model_cfg.engine,
                                       num_rounds=args.rounds))
    if args.tiny:
        model_cfg = dataclasses.replace(
            model_cfg,
            text=dataclasses.replace(model_cfg.text, emb_dim=48),
            scene=dataclasses.replace(model_cfg.scene, emb_dim=48),
            transformer=dataclasses.replace(
                model_cfg.transformer, hidden_dim=64, num_heads=4,
                ffn_dim=128, num_layers=2),
            classifier_hidden=64,
        )
    if args.dropout is not None:
        model_cfg = dataclasses.replace(
            model_cfg,
            transformer=dataclasses.replace(model_cfg.transformer,
                                            dropout=args.dropout),
            engine=dataclasses.replace(model_cfg.engine,
                                       dropout=args.dropout),
            classifier_dropout=args.dropout,
        )
    cfg = dataclasses.replace(
        cfg,
        model=model_cfg,
        batch=BatchConfig(
            num_graphs=args.batch_size, nodes_pad=args.nodes_pad,
            edges_pad=args.edges_pad, question_len=args.question_len,
            program_len=args.program_len,
            full_answer_len=args.full_answer_len,
            layout=args.layout, nodes_per_graph=args.nodes_per_graph,
            edges_per_graph=args.edges_per_graph),
        train=dataclasses.replace(
            cfg.train, lr=args.lr, lr_drop=args.lr_drop,
            epochs=args.epochs, batch_size=args.batch_size,
            weight_decay=args.weight_decay, seed=args.seed,
            print_freq=args.print_freq, output_dir=str(out_dir),
            validate_every=args.validate_every,
            **({"use_bitmap_loss": True} if args.use_execution_engine
               else {}),
            **({} if args.program_loss == "default" else
               {"use_program_loss": args.program_loss == "on"})),
    )

    model = PipelineModel(cfg.model)
    _, label2ans = load_answer_maps()

    val_ds = GQADataset(programs_path(args.val_split),
                        scenes_path(args.val_split), text_vocab, sg_vocab)

    # init from one batch
    meta0, batch0 = next(val_ds.iter_batches(cfg.batch))
    batch0 = jax.tree.map(jnp.asarray, batch0)
    rngs = {"params": jax.random.key(args.seed),
            "dropout": jax.random.key(args.seed + 1),
            "lcgn_ctx": jax.random.key(args.seed + 2)}
    variables = model.init(rngs, batch0.replace(
        programs=batch0.programs[:, :-1],
        full_answers=batch0.full_answers[:, :-1]))
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"number of params: {n_params}")

    # GloVe injection into the shared text embedding (+ optional SG hook),
    # matching pipeline_model_gat.py:633-634
    text_glove, sg_glove = _load_glove(args, text_vocab, sg_vocab, out_dir)
    if text_glove is not None or sg_glove is not None:
        from graphvqa_tpu.models.pretrained import inject_pretrained_embeddings
        variables = inject_pretrained_embeddings(
            variables, text_matrix=text_glove, sg_matrix=sg_glove)
        nz = 0 if text_glove is None else int((text_glove != 0).any(1).sum())
        print(f"injected GloVe: {nz}/{len(text_vocab)} text rows non-zero"
              + (", sg rows injected" if sg_glove is not None else ""))

    state = create_train_state(variables, lr=args.lr, lr_drop=args.lr_drop,
                               weight_decay=args.weight_decay,
                               clip_grad=args.clip_grad)
    start_epoch = args.start_epoch
    if args.resume:
        state, start_epoch = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    rng = jax.random.key(args.seed + 3)
    fast_validate = args.fast_validate or None

    # per-host input sharding (the DistributedSampler replacement,
    # mainExplain_gat.py:197-198): each process packs its slice of the epoch
    proc, nproc = jax.process_index(), jax.process_count()

    if args.edge_parallel > 1:
        # edge-SHARDED greedy-decode eval (VERDICT r4 weak 7): the engine's
        # edge arrays partition by destination ownership exactly as in
        # training, so the big-graph regime evaluates under the same
        # per-device edge memory; the data axis computes redundantly
        # (parallel/edge_sharded.py:make_edge_eval_step)
        from graphvqa_tpu.parallel import make_mesh
        from graphvqa_tpu.parallel.edge_sharded import (
            make_edge_eval_step, prepare_edge_eval_batch)
        n_dev = args.data_parallel * args.edge_parallel
        eval_mesh = make_mesh(data=args.data_parallel,
                              edge=args.edge_parallel,
                              devices=jax.devices()[:n_dev])
        eval_step = make_edge_eval_step(model, cfg, eval_mesh)

        def eval_batches(ds):
            for meta, b in ds.iter_batches(cfg.batch, shard_index=proc,
                                           num_shards=nproc):
                yield meta, prepare_edge_eval_batch(b, eval_mesh)
    else:
        eval_step = make_eval_step(model, cfg)

        def eval_batches(ds):
            it = ds.iter_batches(cfg.batch, shard_index=proc,
                                 num_shards=nproc)
            if args.data_parallel > 1:
                # GSPMD data-parallel eval: shard every leaf's leading axis
                # over the data axis of the SAME device set the train state
                # lives on
                from graphvqa_tpu.parallel import make_mesh
                from graphvqa_tpu.parallel.data_parallel import (
                    shard_eval_batches)
                eval_mesh = make_mesh(data=args.data_parallel, edge=1,
                                      devices=jax.devices()
                                      [:args.data_parallel])
                return shard_eval_batches(it, eval_mesh)
            return it

    if args.evaluate or args.evaluate_sets:
        for split in (args.evaluate_sets or [args.val_split]):
            ds = (val_ds if split == args.val_split else
                  GQADataset(programs_path(split), scenes_path(split),
                             text_vocab, sg_vocab))
            suffix = "" if split == args.val_split else f"_{split}"
            res = validate(
                eval_step, state,
                eval_batches(ds),
                rng, cfg,
                text_vocab=text_vocab, label2ans=label2ans,
                dump_path=str(out_dir / f"dump_results{suffix}.json")
                if args.dump_result else None,
                print_freq=args.print_freq,
                dump_attentions_path=str(
                    out_dir / f"dump_attentions{suffix}.json")
                if args.dump_attentions else None,
                scenes=ds.sg_data if args.dump_attentions else None,
                max_batches=fast_validate,
                print_qualitative=True)
            print(split, res)
        return

    train_ds = GQADataset(programs_path(args.split), scenes_path(args.split),
                          text_vocab, sg_vocab)
    # one linear pass fills the text-id + graph caches BEFORE the worker
    # pool forks, so every worker inherits them warm (fork = zero-copy)
    import time as _time
    t0 = _time.perf_counter()
    train_ds.prewarm()
    print(f"dataset prewarm: {len(train_ds)} rows in "
          f"{_time.perf_counter() - t0:.1f}s")

    from graphvqa_tpu.data.prefetch import prefetch
    if args.data_parallel > 1 or args.edge_parallel > 1:
        # mesh training: stack data_parallel collated shards per step and let
        # shard_map pmean the gradients (the DDP replacement); with
        # --edge-parallel K each shard's graphs additionally partition their
        # edges by destination ownership across the edge axis
        # (parallel/edge_sharded.py; reference launch:
        # mainExplain_gat.py:259-263 had DDP only). --steps-per-dispatch S
        # composes: each dispatch carries S*data_parallel shard batches and
        # scans S mesh steps on device.
        from graphvqa_tpu.parallel import (
            align_dense_group, make_dp_edge_train_step, make_dp_train_step,
            make_mesh, multi_step_batch_sharding, prepare_dp_edge_batch,
            shard_batch_sharding, stack_dispatch_groups, stack_shards)
        n_dev = args.data_parallel * args.edge_parallel
        if len(jax.devices()) < n_dev:
            raise SystemExit(
                f"--data-parallel {args.data_parallel} x --edge-parallel "
                f"{args.edge_parallel} needs {n_dev} devices, have "
                f"{len(jax.devices())}")
        mesh = make_mesh(data=args.data_parallel, edge=args.edge_parallel,
                         devices=jax.devices()[:n_dev])
        K = args.steps_per_dispatch
        D = args.data_parallel
        if args.edge_parallel > 1:
            if cfg.batch.layout != "dense":
                raise SystemExit("--edge-parallel requires --layout dense")
            if cfg.batch.nodes_per_graph % args.edge_parallel:
                raise SystemExit(
                    f"--nodes-per-graph {cfg.batch.nodes_per_graph} must be "
                    f"divisible by --edge-parallel {args.edge_parallel}")
            dp_step = make_dp_edge_train_step(model, cfg, mesh,
                                              steps_per_dispatch=K)

            def put_group(group):
                return prepare_dp_edge_batch(group, mesh, steps=K)
        else:
            dp_step = make_dp_train_step(model, cfg, mesh,
                                         steps_per_dispatch=K)
            sharding = (shard_batch_sharding(mesh) if K <= 1
                        else multi_step_batch_sharding(mesh))

            def put_group(group):
                group = align_dense_group(group)
                group = [jax.tree.map(jnp.asarray, g) for g in group]
                if K <= 1:
                    stacked = stack_shards(group)
                else:
                    stacked = stack_dispatch_groups(
                        [stack_shards(group[i * D:(i + 1) * D])
                         for i in range(K)])
                return jax.device_put(stacked, sharding)

        def dp_batches(epoch):
            it = train_ds.iter_batches(cfg.batch, shuffle=True,
                                       seed=args.seed + epoch, drop_last=True,
                                       shard_index=proc, num_shards=nproc,
                                       num_workers=args.workers,
                                       size_bucket_windows=args.size_bucket,
                                       permute_group=D * K)
            group, metas = [], []
            for m, b in it:
                group.append(b)
                metas.append(m)
                if len(group) == D * K:
                    # merge all shards' meta (ids/types concatenated in shard
                    # order) so downstream consumers see the full step batch
                    merged = {
                        k: [x for m2 in metas for x in m2[k]]
                        for k in metas[0] if isinstance(metas[0][k], list)}
                    merged["real_count"] = sum(
                        m2["real_count"] for m2 in metas)
                    yield merged, put_group(group)
                    group, metas = [], []

        train_step = dp_step
        batches_fn = dp_batches
        steps_per_epoch = len(train_ds) // nproc // (args.batch_size
                                                     * D * K)
    elif args.steps_per_dispatch > 1:
        K = args.steps_per_dispatch
        train_step = make_train_step(model, cfg, steps_per_dispatch=K)
        from graphvqa_tpu.parallel import align_dense_group, stack_shards

        def batches_fn(epoch):
            it = train_ds.iter_batches(
                cfg.batch, shuffle=True, seed=args.seed + epoch,
                drop_last=True, shard_index=proc, num_shards=nproc,
                num_workers=args.workers,
                size_bucket_windows=args.size_bucket, permute_group=K)
            group, metas = [], []
            for m, b in it:
                group.append(b)
                metas.append(m)
                if len(group) == K:
                    merged = {
                        k: [x for m2 in metas for x in m2[k]]
                        for k in metas[0] if isinstance(metas[0][k], list)}
                    merged["real_count"] = sum(
                        m2["real_count"] for m2 in metas)
                    group = align_dense_group(group)
                    stacked = stack_shards(
                        [jax.tree.map(jnp.asarray, g) for g in group])
                    yield merged, stacked
                    group, metas = [], []
        steps_per_epoch = len(train_ds) // nproc // (args.batch_size * K)
    else:
        train_step = make_train_step(model, cfg)

        def batches_fn(epoch):
            return ((m, jax.tree.map(jnp.asarray, b))
                    for m, b in train_ds.iter_batches(
                        cfg.batch, shuffle=True, seed=args.seed + epoch,
                        drop_last=True, shard_index=proc, num_shards=nproc,
                        num_workers=args.workers,
                        size_bucket_windows=args.size_bucket))
        steps_per_epoch = len(train_ds) // nproc // args.batch_size

    for epoch in range(start_epoch, args.epochs):
        from graphvqa_tpu.data.dataset import collate_stats
        stats_before = dict(collate_stats)
        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        state = train_one_epoch(train_step, state,
                                prefetch(batches_fn(epoch), depth=4),
                                rng, epoch,
                                print_freq=args.print_freq,
                                num_batches=steps_per_epoch,
                                engine_rounds=cfg.model.engine.num_rounds,
                                profile_dir=(args.profile_dir or None)
                                if epoch == start_epoch else None)
        epoch_stats = {k: collate_stats[k] - stats_before[k]
                       for k in collate_stats}
        if epoch_stats["flat_fallback"] or epoch_stats["dense_bumped"]:
            print(f"collate layout stats (this epoch): {epoch_stats}")
        if (epoch + 1) % args.validate_every == 0:
            # mid-training validation shards over the data axis too
            # (VERDICT r2 weak 2; reference: mainExplain_gat.py:226-229)
            validate(eval_step, state, eval_batches(val_ds),
                     rng, cfg, text_vocab=text_vocab, label2ans=label2ans,
                     print_freq=args.print_freq, max_batches=fast_validate,
                     print_qualitative=True)
        if jax.process_index() == 0:
            save_checkpoint(out_dir / "ckpt", state)
            # archival copies at the lr-drop and 100-epoch marks
            # (mainExplain_gat.py:371-384)
            if (epoch + 1) % args.lr_drop == 0:
                save_checkpoint(out_dir / f"ckpt{epoch:04d}_lrdrop", state)
            elif (epoch + 1) % 100 == 0:
                save_checkpoint(out_dir / f"ckpt{epoch:04d}", state)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "GraphVQA-TPU", parents=[get_args_parser()])
    main(parser.parse_args())
