"""CLI: train a DeepImpact model
(reference: torchrun -m src.deep_impact.train, train.py:240-283).

Model x objective dispatch matches the reference flag surface:
``--xlmr/--pairwise/--cross_encoder`` pick the model,
``--distil_kl/--distil_mse/--in_batch_negatives`` pick the objective
(default: pairwise cross-entropy on triples).  No torchrun — parallelism is
the device mesh.
"""

from __future__ import annotations

import argparse
from functools import partial
from pathlib import Path

from ..core.config import TrainConfig
from ..data.datasets import DistillationScores, MSMarcoTriples
from ..parallel.dataloader import BatchLoader
from ..parallel.mesh import make_mesh
from ..train.collate import COLLATES
from ..train.trainer import Trainer
from .common import add_model_args, build_model


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_model_args(parser)
    parser.add_argument("--dataset_path", type=Path, required=True)
    parser.add_argument("--queries_path", type=Path, required=True)
    parser.add_argument("--collection_path", type=Path, required=True)
    parser.add_argument("--checkpoint_dir", type=Path, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=3e-6)
    parser.add_argument("--save_every", type=int, default=20000)
    parser.add_argument("--save_best", action="store_true")
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--xlmr", action="store_true")
    parser.add_argument("--pairwise", action="store_true")
    parser.add_argument("--cross_encoder", action="store_true")
    parser.add_argument("--distil_kl", action="store_true")
    parser.add_argument("--distil_mse", action="store_true")
    parser.add_argument("--in_batch_negatives", action="store_true")
    parser.add_argument("--qrels_path", type=Path, default=None)
    parser.add_argument("--eval_every", type=int, default=500)
    parser.add_argument("--no_beir_eval", action="store_true")
    parser.add_argument("--eval_datasets", type=str, default=None,
                        help="comma list of NanoBEIR dataset names to "
                        "evaluate in-training (default: all available). "
                        "Each eval stalls training for the full set "
                        "(~82s for all 13 at 10k docs vs ~40-80s of packed "
                        "training per 500 steps); a subset like "
                        "'msmarco,nfcorpus' keeps the cadence cheap — the "
                        "per-eval stall is logged to metrics.txt as "
                        "eval_stall_seconds")
    parser.add_argument("--nano_beir_dir", type=Path, default=None)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--total_steps", type=int, default=None)
    parser.add_argument("--use_wandb", action="store_true")
    parser.add_argument("--enable_profiler", action="store_true",
                        help="jax.profiler trace under <checkpoint_dir>/profile")
    parser.add_argument("--pack", action="store_true",
                        help="force sequence-packed training batches "
                        "(train/packed.py): several short documents per "
                        "[max_length] row, same loss/gradients to fp "
                        "tolerance, 2.5-3.2x step throughput at MSMARCO doc "
                        "lengths (benchmarks/PACKED_TRAIN.json); "
                        "pairwise_ce/distil only.  DEFAULT for those "
                        "losses — the flag only matters to assert")
    parser.add_argument("--no_pack", action="store_true",
                        help="disable sequence packing (row per document, "
                        "the reference layout)")
    args = parser.parse_args(argv)

    assert not (args.distil_mse and args.distil_kl), "cannot use both distillation losses"
    assert not (
        args.distil_mse and not args.qrels_path
    ), "qrels_path is required for margin-MSE distillation"
    model_flags = [args.xlmr, args.pairwise, args.cross_encoder]
    assert sum(model_flags) <= 1, "only one of --xlmr/--pairwise/--cross_encoder"

    if args.xlmr:
        args.model_kind = "xlmr"
    elif args.pairwise:
        args.model_kind = "pairwise"
    elif args.cross_encoder:
        args.model_kind = "cross_encoder"

    if args.distil_kl:
        loss = "distil_kl"
    elif args.distil_mse:
        loss = "distil_mse"
    elif args.in_batch_negatives:
        loss = "in_batch_negatives"
    elif args.cross_encoder:
        loss = "cross_encoder"
    elif args.pairwise:
        loss = "pairwise_impact"
    else:
        loss = "pairwise_ce"

    model = build_model(args)
    max_length = args.max_length or model.max_length

    if loss in ("distil_kl", "distil_mse"):
        dataset = DistillationScores(
            args.dataset_path,
            args.queries_path,
            args.collection_path,
            qrels_path=args.qrels_path if args.distil_mse else None,
        )
    else:
        dataset = MSMarcoTriples(args.dataset_path, args.queries_path, args.collection_path)

    mesh = make_mesh()
    collate = partial(COLLATES[loss], tokenizer=model.tokenizer, max_length=max_length)
    from ..train.packed import PACKABLE_LOSSES, packing_collate

    if args.pack:
        if args.no_pack:
            parser.error("--pack and --no_pack conflict")
        if loss not in PACKABLE_LOSSES:
            parser.error(
                f"--pack supports {PACKABLE_LOSSES} (per-document masks); "
                f"{loss} scores documents under many query masks — train unpacked"
            )
    # Packing is the measured winner (2.5-3.2x step throughput at MSMARCO doc
    # lengths, identical loss/gradients to fp tolerance) so it is the
    # default wherever it applies; --no_pack restores the reference's
    # row-per-document layout.
    if (args.pack or loss in PACKABLE_LOSSES) and not args.no_pack:
        collate = packing_collate(collate, n_data=int(mesh.shape["data"]))
    loader = BatchLoader(
        dataset, args.batch_size, collate, shuffle=True, seed=args.seed, drop_last=True
    )

    evaluator = None
    if not args.no_beir_eval:
        from ..evaluation.nano_beir import NanoBEIREvaluator

        evaluator = NanoBEIREvaluator(
            batch_size=64,
            local_data_dir=args.nano_beir_dir,
            datasets=(args.eval_datasets.split(",") if args.eval_datasets
                      else None),
        )

    config = TrainConfig(
        batch_size=args.batch_size,
        lr=args.lr,
        seed=args.seed,
        max_length=max_length,
        grad_accumulation_steps=args.gradient_accumulation_steps,
        save_every=args.save_every,
        save_best=args.save_best,
        eval_every=args.eval_every,
        loss=loss,
    )
    from ..core.metrics_log import MetricsLogger

    metrics_logger = MetricsLogger(
        args.checkpoint_dir, use_wandb=args.use_wandb, config=vars(args)
    )
    trainer = Trainer(
        model,
        config,
        args.checkpoint_dir,
        mesh=mesh,
        evaluator=evaluator,
        metrics_logger=metrics_logger,
    )
    from ..core.profiling import trace

    with trace(args.checkpoint_dir / "profile", enabled=args.enable_profiler):
        done = trainer.maybe_resume()
        steps_per_epoch = len(loader)
        for epoch in range(args.epochs):
            if done >= steps_per_epoch:
                done -= steps_per_epoch  # epoch fully seen before resume
                continue
            avg = trainer.train(
                loader.epoch(epoch), total_steps=args.total_steps, skip=done
            )
            done = 0
            print(f"epoch {epoch}: avg loss {avg:.5f}")
    metrics_logger.finish()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
