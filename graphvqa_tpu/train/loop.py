"""Train / validate loops.

TPU re-design of the reference driver (mainExplain_gat.py:387-672,675-942):
one jit-compiled ``train_step(state, batch, rng)`` per bucket shape does
forward + loss + backward + Adam update + in-graph metrics; the host loop just
feeds batches and aggregates scalar meters. Validation runs the greedy-decode
path (SAMPLE_FLAG equivalent) and can accumulate the official result dump.
"""
from __future__ import annotations

import functools
import os
import json
import pathlib
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from graphvqa_tpu.config import Config
from graphvqa_tpu.core.graph import QABatch
from graphvqa_tpu.models import PipelineModel
from graphvqa_tpu.train.logging_utils import AverageMeter, ProgressMeter
from graphvqa_tpu.train.losses import total_loss
from graphvqa_tpu.train.metrics import (
    program_match_vectors, program_string_exact_match_acc,
    reduce_scanned_metrics, topk_accuracy)
from graphvqa_tpu.train.train_state import TrainState


def _teacher_inputs(batch: QABatch) -> QABatch:
    """programs[:-1] / full_answers[:-1] teacher forcing slice
    (mainExplain_gat.py:437-440) — batch-first."""
    return batch.replace(
        programs=batch.programs[:, :-1],
        full_answers=batch.full_answers[:, :-1],
    )


def make_train_step(model: PipelineModel, cfg: Config,
                    steps_per_dispatch: int = 1) -> Callable:
    """``steps_per_dispatch`` > 1 returns a step that takes K batches
    stacked on a leading axis and runs K sequential optimizer steps inside
    ONE ``lax.scan`` dispatch — amortizing per-call host/dispatch latency
    (dominant through a remote-TPU relay; material even locally at 60 ms
    steps). Semantically identical to K single dispatches: the rng folds on
    ``state.step`` per inner step. Metrics come back reduced over K
    (counts summed, losses batch-weighted-meaned, lr last)."""
    pad = cfg.model.text.pad_idx
    tc = cfg.train

    def train_step_body(state: TrainState, batch: QABatch, rng: jax.Array):
        d_rng, ctx_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        model_in = _teacher_inputs(batch)
        programs_target = batch.programs[:, 1:]
        full_answers_target = batch.full_answers[:, 1:]

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                model_in, sample=False, deterministic=False,
                use_running_average=False,
                rngs={"dropout": d_rng, "lcgn_ctx": ctx_rng},
                mutable=["batch_stats"],
            )
            loss, parts = total_loss(
                out, programs_target, full_answers_target,
                batch.short_answer_label, pad,
                bitmap_true=batch.graphs.exec_bitmap,
                node_mask=batch.graphs.node_mask,
                use_program_loss=tc.use_program_loss,
                use_full_answer_loss=tc.use_full_answer_loss,
                use_bitmap_loss=tc.use_bitmap_loss,
            )
            return loss, (parts, out, mutated)

        grads, (parts, out, mutated) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(
            grads, new_batch_stats=mutated["batch_stats"])

        sa_correct, sa_total = topk_accuracy(
            out.short_answer_logits, batch.short_answer_label)
        prog_pred = jnp.argmax(out.program_logits, axis=-1)
        (p_c, p_t), (g_c, g_t), (ne_c, ne_t) = program_string_exact_match_acc(
            prog_pred, programs_target, pad, cfg.model.max_execution_steps)

        metrics = dict(parts)
        metrics.update(
            short_answer_correct=sa_correct, short_answer_total=sa_total,
            program_correct=p_c, program_total=p_t,
            program_group_correct=g_c, program_group_total=g_t,
            program_nonempty_correct=ne_c, program_nonempty_total=ne_t,
            lr=state.current_lr(),
        )
        if out.execution_bitmap is not None:
            # explainability metric (mainExplain_gat.py:1013-1042); train
            # batches use drop_last so every row is real
            from graphvqa_tpu.nn.execution import bitmap_precision_recall
            tp_p, p_div, tp_r, r_div = bitmap_precision_recall(
                out.execution_bitmap, batch.graphs.exec_bitmap,
                batch.graphs.node_mask)
            metrics.update(bitmap_tp=tp_p, bitmap_pred_total=p_div,
                           bitmap_true_total=r_div)
        # real edge count feeds the throughput meter (edges/s, BASELINE.json)
        metrics["edge_count"] = batch.graphs.edge_mask.sum()
        return new_state, metrics

    if steps_per_dispatch <= 1:
        return jax.jit(train_step_body)

    @jax.jit
    def multi_step(state: TrainState, stacked: QABatch, rng: jax.Array):
        def scan_fn(st, batch_k):
            st2, m = train_step_body(st, batch_k, rng)
            return st2, m
        new_state, ms = jax.lax.scan(scan_fn, state, stacked)
        return new_state, reduce_scanned_metrics(ms)

    return multi_step


def make_eval_step(model: PipelineModel, cfg: Config) -> Callable:
    pad = cfg.model.text.pad_idx

    @jax.jit
    def eval_step(state: TrainState, batch: QABatch, rng: jax.Array):
        """Greedy-decode validation (SAMPLE_FLAG path,
        mainExplain_gat.py:758-765).

        Returns per-row signals rather than counts so the host can mask the
        replicated tail of ragged final batches out of every metric."""
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            _teacher_inputs(batch), sample=True, deterministic=True,
            use_running_average=True,
            rngs={"lcgn_ctx": rng},
        )
        # sampled buffer vs *full* target incl. <start>
        # (mainExplain_gat.py:746,788-791)
        match, group_match, empty = program_match_vectors(
            out.program_tokens, batch.programs, pad,
            cfg.model.max_execution_steps)
        sa_pred = jnp.argmax(out.short_answer_logits, axis=-1)
        sa_score = jnp.max(out.short_answer_logits, axis=-1)
        vectors = dict(
            sa_pred=sa_pred, sa_score=sa_score,
            program_match=match, program_group_match=group_match,
            program_empty=empty,
        )
        if out.execution_bitmap is not None:
            vectors["execution_bitmap"] = out.execution_bitmap
        return vectors, out.program_tokens, out.node_attention

    return eval_step


def train_one_epoch(
    train_step: Callable,
    state: TrainState,
    batches,
    rng: jax.Array,
    epoch: int,
    print_freq: int = 100,
    num_batches: Optional[int] = None,
    engine_rounds: int = 5,
    profile_dir: Optional[str] = None,
    profile_steps: tuple = (5, 10),
) -> TrainState:
    """``profile_dir`` captures a jax.profiler trace (TensorBoard/XProf)
    over steps [profile_steps) of this epoch; throughput (qa/s, edges/s) is
    reported at every print — the BASELINE.json metrics."""
    from graphvqa_tpu.train.profiling import ThroughputMeter
    losses = AverageMeter("Loss", ":.4e")
    sa = AverageMeter("Acc@Short", ":6.2f")
    pa = AverageMeter("Acc@Program", ":6.2f")
    pg = AverageMeter("Acc@ProgramGroup", ":4.2f")
    pne = AverageMeter("Acc@ProgramNonEmpty", ":4.2f")
    bprec = AverageMeter("Bitmap@Precision", ":4.2f")
    brec = AverageMeter("Bitmap@Recall", ":4.2f")
    progress = ProgressMeter(num_batches or 0, [losses, sa, pa, pg, pne],
                             prefix=f"Epoch: [{epoch}]")

    tput = ThroughputMeter(engine_rounds)
    profiler_on = False

    # Metric dicts stay ON DEVICE until a print boundary: fetching the ~12
    # scalar metrics every step blocks the host on the step's completion
    # (and a relay round-trip each), serializing dispatch; deferring the
    # jax.device_get keeps the host a few steps ahead (the DDP-style async
    # pipeline the prefetching input thread feeds).
    pending = []

    def drain():
        for m in jax.device_get(pending):
            bsz = int(m["short_answer_total"])
            tput.update(bsz, int(m.get("edge_count", 0)))
            losses.update(float(m["total"]), bsz)
            sa.update(100.0 * float(m["short_answer_correct"]) / max(bsz, 1),
                      bsz)
            pt = int(m["program_total"])
            pa.update(100.0 * float(m["program_correct"]) / max(pt, 1), pt)
            gt = int(m["program_group_total"])
            pg.update(100.0 * float(m["program_group_correct"]) / max(gt, 1),
                      gt)
            nt = int(m["program_nonempty_total"])
            pne.update(
                100.0 * float(m["program_nonempty_correct"]) / max(nt, 1), nt)
            if "bitmap_tp" in m:
                tp = float(m["bitmap_tp"])
                pd = max(float(m["bitmap_pred_total"]), 1.0)
                td = max(float(m["bitmap_true_total"]), 1.0)
                bprec.update(100.0 * tp / pd, int(pd))
                brec.update(100.0 * tp / td, int(td))
        pending.clear()

    # data-wait accounting (the reference's data_time meter,
    # mainExplain_gat.py:391-392,420): time the host spends blocked on the
    # input pipeline vs total wall time. train_step dispatch is async, so
    # a device-bound epoch shows low data-wait (host blocks in drain()'s
    # device_get instead) and an input-bound epoch shows high data-wait.
    import time
    data_time = 0.0
    epoch_t0 = time.perf_counter()

    def wait_pct():
        return 100.0 * data_time / max(time.perf_counter() - epoch_t0, 1e-9)

    i = -1
    it = iter(batches)
    while True:
        f0 = time.perf_counter()
        try:
            _, batch = next(it)
        except StopIteration:
            break
        data_time += time.perf_counter() - f0
        i += 1
        if profile_dir is not None:
            if i == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
                profiler_on = True
            elif i == profile_steps[1] and profiler_on:
                jax.profiler.stop_trace()
                profiler_on = False
        state, m = train_step(state, batch, rng)
        pending.append(m)
        if i % print_freq == 0:
            drain()
            progress.display(i)
            print(f"  throughput: {tput.summary()}, "
                  f"data-wait {wait_pct():.1f}%")
            if bprec.count:
                print(f"  {bprec}  {brec}")
    if profiler_on:
        jax.profiler.stop_trace()
    drain()
    progress.display(i + 1)
    print(f"  epoch sustained: {tput.summary()}, data-wait {wait_pct():.1f}%"
          f" ({time.perf_counter() - epoch_t0:.1f}s wall)")
    return state


def _sync_meters(*meters):
    """Cross-process metric reduction for the host-computed validate meters
    (no-op single-process)."""
    if jax.process_count() > 1:
        for m in meters:
            m.synchronize()


def _print_qualitative(meta, batch, prog_np, sa_pred_np, text_vocab,
                       label2ans, real, max_steps, limit=8):
    """First-batch qualitative sample dump (mainExplain_gat.py:804-841)."""
    M = max_steps
    programs_np = jax.device_get(batch.programs)
    questions_np = jax.device_get(batch.questions)
    for b in range(min(real, limit)):
        question = (meta["questions"][b] if meta.get("questions")
                    else text_vocab.decode(questions_np[b]))
        gt_progs = [text_vocab.decode(programs_np[s + M * b])
                    for s in range(M)]
        pred_progs = [text_vocab.decode(prog_np[s + M * b])
                      for s in range(M)]
        gt_progs = [s for s in gt_progs if s]
        pred_progs = [s for s in pred_progs if s]
        answer = meta["answers"][b] if meta.get("answers") else "?"
        pred = (label2ans[int(sa_pred_np[b])] if label2ans is not None
                else str(int(sa_pred_np[b])))
        print("=" * 16)
        print("question:", question)
        print("ground truth program:", " | ".join(gt_progs))
        print("predicted program:  ", " | ".join(pred_progs))
        print(f"answer: {answer}   prediction: {pred}")


def validate(
    eval_step: Callable,
    state: TrainState,
    batches,
    rng: jax.Array,
    cfg: Config,
    text_vocab=None,
    label2ans=None,
    dump_path: Optional[str] = None,
    print_freq: int = 100,
    dump_attentions_path: Optional[str] = None,
    scenes: Optional[dict] = None,
    max_batches: Optional[int] = None,
    print_qualitative: bool = False,
) -> Dict[str, float]:
    """``dump_attentions_path`` + ``scenes`` additionally write the official
    object-based attentions file ([{"questionId", "attention": [[x0, y0, x1,
    y1, att], ...]}], eval.py:160-165,328-329) from the pooling gate — node
    order is the builder's sorted-object-id order (data/scene_graph.py).

    ``max_batches`` is the FAST_VALIDATE knob (mainExplain_gat.py:675,707-710);
    ``print_qualitative`` prints decoded samples of the first batch
    (mainExplain_gat.py:804-841). Every metric counts only the real
    (non-replicated) rows of ragged final batches. With multiple processes the
    result/attention dumps are gathered host-side before the rank-0 write
    (util/misc.py:88-128 equivalent)."""
    if jax.process_count() > 1:
        # _sync_meters below is a blocking collective whose CALL COUNT
        # depends on print_freq/max_batches; a cross-process mismatch
        # deadlocks or corrupts gathers. Check the invariant once up front
        # (cheap: one host all-gather) instead of leaving it implicit.
        from graphvqa_tpu.parallel.collectives import all_gather_host
        cfgs = all_gather_host((print_freq, max_batches))
        if any(c != cfgs[0] for c in cfgs):
            raise ValueError(
                f"validate() needs identical print_freq/max_batches on "
                f"every process (got {cfgs}) — its metric synchronization "
                f"is a collective whose call count depends on them")
    sa = AverageMeter("Acc@Short", ":6.2f")
    pa = AverageMeter("Acc@Program", ":6.2f")
    pg = AverageMeter("Acc@ProgramGroup", ":4.2f")
    pne = AverageMeter("Acc@ProgramNonEmpty", ":4.2f")
    bprec = AverageMeter("Bitmap@Precision", ":4.2f")
    brec = AverageMeter("Bitmap@Recall", ":4.2f")
    progress = ProgressMeter(0, [sa, pa, pg, pne], prefix="Test: ")
    quesid2ans = {}
    attentions_out = []
    M = cfg.model.max_execution_steps

    import time
    eval_t0 = time.perf_counter()
    total_real = 0

    i = -1
    for i, (meta, batch) in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        vec, prog_tokens, node_att = eval_step(state, batch, rng)
        real = meta.get("real_count", batch.questions.shape[0])
        total_real += real
        # all metrics count only real (non-replicated) rows: slice the
        # per-row signal vectors on the host
        sa_pred_np = jax.device_get(vec["sa_pred"])[:real]
        sa_score_np = jax.device_get(vec["sa_score"])[:real]
        prog_np = jax.device_get(prog_tokens)
        labels = jax.device_get(batch.short_answer_label)[:real]
        match = jax.device_get(vec["program_match"])[: real * M]
        gmatch = jax.device_get(vec["program_group_match"])[:real]
        empty = jax.device_get(vec["program_empty"])[: real * M]
        sa.update(100.0 * float((sa_pred_np == labels).sum()) / max(real, 1), real)
        pa.update(100.0 * float(match.sum()) / max(real * M, 1), real * M)
        pg.update(100.0 * float(gmatch.sum()) / max(real, 1), real)
        nt = real * M - int(empty.sum())
        pne.update(100.0 * float(match.sum() - empty.sum()) / max(nt, 1), nt)
        if "execution_bitmap" in vec and real > 0:
            # bitmap precision/recall over real graphs' nodes only
            # (mainExplain_gat.py:1013-1042)
            bm_pred = jax.device_get(vec["execution_bitmap"])
            bm_true = jax.device_get(batch.graphs.exec_bitmap)
            ng = jax.device_get(batch.graphs.node_graph)
            nmask = jax.device_get(batch.graphs.node_mask) & (ng < real)
            pred = (bm_pred >= 0.5) & nmask[:, None]
            true = (bm_true >= 0.5) & nmask[:, None]
            tp = float((pred & true).sum())
            bprec.update(100.0 * tp / max(float(pred.sum()), 1.0),
                         max(int(pred.sum()), 1))
            brec.update(100.0 * tp / max(float(true.sum()), 1.0),
                        max(int(true.sum()), 1))

        if i == 0 and print_qualitative and text_vocab is not None:
            _print_qualitative(meta, batch, prog_np, sa_pred_np, text_vocab,
                               label2ans, real, M)

        if dump_path is not None and text_vocab is not None:
            programs_np = jax.device_get(batch.programs)
            # batch detokenization: per-row Python decode was the host-side
            # eval ceiling at production batch sizes (VERDICT r4 weak 4;
            # measured 4x in tools/bench_validate_host.py)
            gt_rows = text_vocab.decode_batch(programs_np[: real * M])
            pred_rows = text_vocab.decode_batch(prog_np[: real * M])
            for b in range(real):
                qid = meta["question_ids"][b]
                gt_progs, pred_progs = [], []
                for s in range(M):
                    row = s + M * b
                    gt_sent = gt_rows[row]
                    pred_sent = pred_rows[row]
                    if not gt_sent and not pred_sent:
                        continue
                    gt_progs.append(gt_sent)
                    pred_progs.append(pred_sent)
                quesid2ans[str(qid)] = {
                    "questionId": str(qid),
                    "question": meta["questions"][b],
                    "ground_truth_program_list": gt_progs,
                    "predicted_program_list": pred_progs,
                    "answer": meta["answers"][b],
                    "prediction": label2ans[int(sa_pred_np[b])],
                    "prediction_score": "{:.2f}".format(float(sa_score_np[b])),
                    "types": meta["types"][b],
                }
        if dump_attentions_path is not None and scenes is not None:
            node_att_np = jax.device_get(node_att)
            node_graph_np = jax.device_get(batch.graphs.node_graph)
            for b in range(real):
                image_id = meta["image_ids"][b]
                scene = scenes.get(str(image_id), {})
                objects = scene.get("objects", {})
                if not objects:
                    continue
                att = node_att_np[node_graph_np == b]
                boxes = []
                w = float(scene.get("width", 1)) or 1.0
                h = float(scene.get("height", 1)) or 1.0
                for k, oid in enumerate(sorted(objects.keys())):
                    if k >= len(att):
                        break
                    o = objects[oid]
                    boxes.append([o["x"] / w, o["y"] / h,
                                  (o["x"] + o["w"]) / w,
                                  (o["y"] + o["h"]) / h,
                                  float(att[k])])
                attentions_out.append(
                    {"questionId": str(meta["question_ids"][b]),
                     "attention": boxes})
        if i % print_freq == 0:
            _sync_meters(sa, pa, pg, pne, bprec, brec)
            progress.display(i)
    # global (not shard-local) metrics before the final display and the
    # return (reference: SmoothedValue.synchronize_between_processes +
    # reduce_dict, util/misc.py:44-55,131-155). Safe as a collective:
    # iter_batches equalizes per-shard batch counts.
    _sync_meters(sa, pa, pg, pne, bprec, brec)
    progress.display(i + 1)
    wall = time.perf_counter() - eval_t0
    print(f"  eval sustained: {total_real / max(wall, 1e-9):.1f} qa/s "
          f"({total_real} questions, {wall:.1f}s wall)")

    # multi-process validation: every process holds 1/P of the results
    # (per-host input sharding) — gather before the rank-0 dump
    if jax.process_count() > 1 and (dump_path or dump_attentions_path):
        from graphvqa_tpu.parallel.collectives import all_gather_host
        gathered = all_gather_host((quesid2ans, attentions_out))
        quesid2ans = {}
        attentions_out = []
        for qa, att in gathered:
            quesid2ans.update(qa)
            attentions_out.extend(att)

    if jax.process_index() == 0:
        if dump_attentions_path is not None:
            path = pathlib.Path(dump_attentions_path)
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(json.dumps(attentions_out))
            print("Attentions Dumped!", str(path))

        if dump_path is not None:
            path = pathlib.Path(dump_path)
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(json.dumps(quesid2ans, indent=4, sort_keys=True))
            print("Result Dumped!", str(path))

    out = {"short_answer_acc": sa.avg, "program_acc": pa.avg,
           "program_group_acc": pg.avg, "program_nonempty_acc": pne.avg}
    if bprec.global_count:
        out["bitmap_precision"] = bprec.avg
        out["bitmap_recall"] = brec.avg
    return out
