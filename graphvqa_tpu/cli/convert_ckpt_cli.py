"""Convert a reference GraphVQA torch checkpoint into a resumable
graphvqa_tpu checkpoint.

    python -m graphvqa_tpu.cli.convert_ckpt_cli \
        --torch-ckpt checkpoint.pth --out outputdir/ckpt_converted

The input is the reference trainer's ``torch.save({'model': state_dict,
...})`` (mainExplain_gat.py:371-384); the output is an orbax checkpoint
directory that ``--resume`` accepts directly, so a reference user evaluates
their trained model here with:

    python -m graphvqa_tpu.cli.train_cli --model gat --evaluate \
        --resume outputdir/ckpt_converted --dump-result ...

Pass ``--torch-vocab questions/GQA_TEXT_obj.pkl`` to ALSO import the
reference's pickled torchtext vocabulary (gqa_dataset_entry.py:546-578) as
``text_vocab.json`` next to the checkpoint — required for correctness: the
converted ``text_vocab_embedding`` rows are indexed by that vocab's exact
``itos`` order, and the trainer loads ``out_dir/text_vocab.json`` in
preference to rebuilding one locally (cli/train_cli.py).  No torchtext
install is needed (data/torchtext_import.py).  ``--torch-vocab`` also works
standalone (without ``--torch-ckpt``).

Parameter mapping: models/torch_convert.py:convert_pipeline_gat (numeric
end-to-end parity asserted by
tests/test_pipeline_convert.py::test_full_model_converted_checkpoint_numeric_parity).
The optimizer state starts fresh (the reference's Adam moments are not
transferable across frameworks' flattened layouts); ``--epoch`` seeds the
StepLR schedule position for resumed TRAINING.
"""
from __future__ import annotations

import argparse
import pathlib


def get_args_parser():
    p = argparse.ArgumentParser("GraphVQA torch checkpoint converter",
                                add_help=False)
    p.add_argument("--torch-ckpt", default="",
                   help="reference checkpoint .pth (torch.save dict with a "
                        "'model' state_dict, or a bare state_dict)")
    p.add_argument("--out", default="",
                   help="output orbax checkpoint directory (pass to --resume)")
    p.add_argument("--torch-vocab", default="",
                   help="reference GQA_TEXT_obj.pkl (pickled torchtext "
                        "Field, gqa_dataset_entry.py:546-578); imported "
                        "without torchtext into text_vocab.json so converted "
                        "embedding rows index correctly")
    p.add_argument("--vocab-out", default="",
                   help="where to write the imported text_vocab.json "
                        "(default: the parent of --out, i.e. the trainer's "
                        "output_dir, which is where the trainer looks)")
    p.add_argument("--model", default="gat",
                   choices=["gat", "gcn", "gine", "lcgn", "onlysg"],
                   help="which reference model family the checkpoint is "
                        "(mainExplain_gat/_gcn/_gine/_lcgn drivers)")
    p.add_argument("--num-encoder-layers", type=int, default=3)
    p.add_argument("--num-decoder-layers", type=int, default=3)
    p.add_argument("--num-rounds", type=int, default=5)
    p.add_argument("--lcgn-iters", type=int, default=4)
    p.add_argument("--epoch", type=int, default=None,
                   help="schedule position to record (defaults to the "
                        "checkpoint's saved epoch, else 0)")
    return p


def main(args):
    import numpy as np

    if not args.torch_ckpt and not args.torch_vocab:
        raise SystemExit("nothing to do: pass --torch-ckpt and/or "
                         "--torch-vocab")
    if args.torch_ckpt and not args.out:
        raise SystemExit("--torch-ckpt requires --out")

    if args.torch_vocab:
        from graphvqa_tpu.data.torchtext_import import import_reference_vocab
        vocab_out = pathlib.Path(args.vocab_out) if args.vocab_out else (
            pathlib.Path(args.out).resolve().parent / "text_vocab.json")
        vocab_out.parent.mkdir(parents=True, exist_ok=True)
        glove_out = vocab_out.with_name("glove_text.npy")
        n, wrote_glove = import_reference_vocab(
            args.torch_vocab, vocab_out, glove_out)
        print(f"imported reference vocab: {n} tokens -> {vocab_out}"
              + (f" (+ aligned GloVe matrix {glove_out})" if wrote_glove
                 else " (no pretrained vectors in the pickle)"))
        if not args.torch_ckpt:
            return

    import torch

    from graphvqa_tpu.models.torch_convert import convert_pipeline, to_jax
    from graphvqa_tpu.train.checkpoint import save_checkpoint
    from graphvqa_tpu.train.train_state import create_train_state

    blob = torch.load(args.torch_ckpt, map_location="cpu",
                      weights_only=False)
    sd_t = blob.get("model", blob) if isinstance(blob, dict) else blob
    # DDP checkpoints prefix every key with 'module.'
    sd = {k[len("module."):] if k.startswith("module.") else k:
          v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd_t.items()}

    variables = to_jax(convert_pipeline(
        sd, kind=args.model, num_encoder_layers=args.num_encoder_layers,
        num_decoder_layers=args.num_decoder_layers,
        num_rounds=args.num_rounds, lcgn_iters=args.lcgn_iters))
    n = sum(int(np.size(x)) for x in
            __import__("jax").tree.leaves(variables["params"]))
    print(f"converted {len(sd)} torch tensors -> {n/1e6:.1f}M params")

    state = create_train_state(variables)
    epoch = args.epoch
    if epoch is None:
        epoch = int(blob.get("epoch", 0)) if isinstance(blob, dict) else 0
    import jax.numpy as jnp
    state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))

    out = pathlib.Path(args.out)
    save_checkpoint(out, state)
    print(f"saved orbax checkpoint at {out} (epoch={epoch}); evaluate with "
          f"--resume {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "GraphVQA-TPU checkpoint converter", parents=[get_args_parser()])
    main(parser.parse_args())
