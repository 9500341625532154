"""Official GQA scorer — accuracy / binary / open / validity / plausibility /
consistency / distribution / grounding + per-type breakdowns.

Clean reimplementation of the official evaluation protocol (reference:
eval.py:170-478), consuming the ``dump_results.json`` produced by
``train.loop.validate`` (same schema as mainExplain_gat.py:863-942).

Semantics preserved:
  * metrics are computed over ``isBalanced`` questions only;
  * missing predictions default to 'yes' (eval.py:150-158);
  * binary vs open split = structural type == 'query' -> open (eval.py:389);
  * validity/plausibility membership checks with the "Common" -> [color,
    material, shape] normalization (eval.py:240-245);
  * consistency = mean correctness of entailed questions, counted only when
    the source question is correct (eval.py:250-266);
  * distribution = chi-square of gold vs predicted answer histograms per
    global group, weighted by group size, / 100 (eval.py:345-362,414);
  * steps count excludes exist / query:name / choose name ops (eval.py:217-219).
"""
from __future__ import annotations

import argparse
import json
import pathlib
from collections import defaultdict
from typing import Dict, Optional


def _avg(lst):
    return float(sum(lst)) / len(lst) if lst else 0.0


def _steps_num(question: dict) -> int:
    return len([c for c in question["semantic"]
                if not any(o in "{}: {}".format(c["operation"], c["argument"])
                           for o in ("exist", "query: name", "choose name"))])


def _belongs(element, group, question) -> bool:
    if "Common" in question["types"]["detailed"]:
        group = ["color", "material", "shape"]
    return element in group


def score_predictions(
    questions: Dict[str, dict],
    predictions: Dict[str, str],
    choices: Optional[Dict[str, dict]] = None,
    consistency: bool = False,
) -> dict:
    """Compute the official metric dict.

    Args:
      questions: raw GQA questions (val_all for consistency, else balanced)
      predictions: questionId -> predicted short answer
      choices: questionId -> {"valid": [...], "plausible": [...]} (optional)
      consistency: include the consistency metric (needs entailed coverage)
    """
    # missing predictions default to 'yes'
    predictions = dict(predictions)
    for qid, q in questions.items():
        if qid not in predictions and (consistency or q.get("isBalanced")):
            predictions[qid] = "yes"

    scores = {
        "accuracy": [], "binary": [], "open": [],
        "validity": [], "plausibility": [], "consistency": [],
        "accuracyPerStructuralType": defaultdict(list),
        "accuracyPerSemanticType": defaultdict(list),
        "accuracyPerLength": defaultdict(list),
        "accuracyPerSteps": defaultdict(list),
    }
    dist_gold: dict = defaultdict(lambda: defaultdict(int))
    dist_pred: dict = defaultdict(lambda: defaultdict(int))

    for qid, q in questions.items():
        if not q.get("isBalanced"):
            continue
        gold = q["answer"]
        predicted = predictions[qid]
        correct = predicted == gold
        score = 1.0 if correct else 0.0

        scores["accuracy"].append(score)
        scores["accuracyPerLength"][len(q["question"].split())].append(score)
        scores["accuracyPerSteps"][_steps_num(q)].append(score)
        scores["accuracyPerStructuralType"][q["types"]["structural"]].append(score)
        scores["accuracyPerSemanticType"][q["types"]["semantic"]].append(score)
        answer_type = "open" if q["types"]["structural"] == "query" else "binary"
        scores[answer_type].append(score)

        if choices is not None and qid in choices:
            scores["validity"].append(
                1.0 if _belongs(predicted, choices[qid]["valid"], q) else 0.0)
            scores["plausibility"].append(
                1.0 if _belongs(predicted, choices[qid]["plausible"], q) else 0.0)

        group = q.get("groups", {}).get("global")
        if group is not None and group != "":
            dist_gold[group][gold] += 1
            dist_pred[group][predicted] += 1

        if consistency and correct:
            inferred = [e for e in q.get("entailed", []) if e != qid]
            if inferred:
                cons, any_present = [], False
                for eid in inferred:
                    if eid not in questions:
                        continue
                    any_present = True
                    cons.append(
                        1.0 if predictions.get(eid) == questions[eid]["answer"]
                        else 0.0)
                if any_present:
                    scores["consistency"].append(_avg(cons))

    # chi-square distribution metric
    sum_score = sum_overall = 0.0
    for group in dist_gold:
        g_score = overall = 0.0
        for ans, e in dist_gold[group].items():
            o = dist_pred[group].get(ans, 0)
            g_score += (float(o - e) ** 2) / e
            overall += e
        sum_score += g_score * overall
        sum_overall += overall
    distribution = (sum_score / sum_overall / 100.0) if sum_overall else 0.0

    out = {
        "accuracy": _avg(scores["accuracy"]) * 100,
        "binary": _avg(scores["binary"]) * 100,
        "open": _avg(scores["open"]) * 100,
        "validity": _avg(scores["validity"]) * 100,
        "plausibility": _avg(scores["plausibility"]) * 100,
        "consistency": _avg(scores["consistency"]) * 100,
        "distribution": distribution,
        "accuracyPerStructuralType": {
            k: (_avg(v) * 100, len(v))
            for k, v in scores["accuracyPerStructuralType"].items()},
        "accuracyPerSemanticType": {
            k: (_avg(v) * 100, len(v))
            for k, v in scores["accuracyPerSemanticType"].items()},
        "accuracyPerSteps": {
            k: (_avg(v) * 100, len(v))
            for k, v in scores["accuracyPerSteps"].items()},
        "accuracyPerLength": {
            k: (_avg(v) * 100, len(v))
            for k, v in scores["accuracyPerLength"].items()},
        "num_questions": len(scores["accuracy"]),
    }
    return out


def format_report(scores: dict, consistency: bool = False) -> str:
    """Human-readable report in the eval_result/* layout (eval.py:444-478)."""
    lines = []
    for m in ("binary", "open", "accuracy", "consistency", "validity",
              "plausibility", "distribution"):
        if m == "consistency" and not consistency:
            continue
        suffix = " (lower is better)" if m == "distribution" else "%"
        lines.append(f"{m.capitalize()}: {scores[m]:.2f}{suffix}")
    for key, title in (
            ("accuracyPerStructuralType", "Accuracy / structural type"),
            ("accuracyPerSemanticType", "Accuracy / semantic type"),
            ("accuracyPerSteps", "Accuracy / steps number"),
            ("accuracyPerLength", "Accuracy / words number")):
        lines.append("")
        lines.append(f"{title}:")
        for t in sorted(scores[key]):
            s, n = scores[key][t]
            lines.append(f"  {t}: {s:.2f}% ({n} questions)")
    return "\n".join(lines)


def main():
    parser = argparse.ArgumentParser("GQA official scorer")
    parser.add_argument("--questions", required=True)
    parser.add_argument("--predictions", required=True,
                        help="dump_results.json from validate()")
    parser.add_argument("--choices", default=None)
    parser.add_argument("--consistency", action="store_true")
    args = parser.parse_args()

    questions = json.loads(pathlib.Path(args.questions).read_text())
    dump = json.loads(pathlib.Path(args.predictions).read_text())
    predictions = {qid: d["prediction"] for qid, d in dump.items()}
    choices = (json.loads(pathlib.Path(args.choices).read_text())
               if args.choices else None)
    scores = score_predictions(questions, predictions, choices,
                               consistency=args.consistency)
    print(format_report(scores, consistency=args.consistency))


if __name__ == "__main__":
    main()
