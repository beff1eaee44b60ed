"""Experiment CLI — the counterpart of the reference's src/run.py.

Flags mirror run_rag.sh / run.py:16-60 (three stage groups: c_* cell
search, o_* op search, plain fine-tune), plus TPU-native additions: mesh
shape, synthetic-data mode (the reference ships no pixels, only filename
lists pointing at the authors' machines), checkpoint/resume, and a Scene
Router stage. ``--mode=train`` is intentionally NOT a separate broken
branch (reference quirk, SURVEY.md); one mode drives everything.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native continual stereo (RAG capability surface)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--experiment", default="drivingstereo")
    p.add_argument("--id", default="0")
    p.add_argument("--output", default="logs")
    p.add_argument("--variant", choices=["stereo", "depth"], default="stereo")

    # data
    p.add_argument("--data-root", default="", help="prefix for filename lists")
    p.add_argument("--train-lists", nargs="*", default=[],
                   help="per-scene train filename lists (left right disp)")
    p.add_argument("--test-lists", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic stereograms (no real data needed)")
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--synthetic-hw", type=int, nargs=2, default=[96, 192])
    p.add_argument("--synthetic-eval-hw", type=int, nargs=2, default=None,
                   help="test-set geometry (e.g. 480 960 for the canonical "
                        "eval protocol); defaults to --synthetic-hw")
    p.add_argument("--synthetic-eval-size", type=int, default=None,
                   help="test pairs per scene (default: --synthetic-size)")

    # cell search stage (c_*)
    p.add_argument("--c_epochs", type=int, default=100)
    p.add_argument("--c_batch", type=int, default=8)
    p.add_argument("--c_lr", type=float, default=0.002)
    p.add_argument("--c_lr_a", type=float, default=0.01)
    p.add_argument("--c_lamb", type=float, default=3e-4)
    p.add_argument("--skip-cell-search", action="store_true")

    # op search stage (o_*)
    p.add_argument("--o_epochs", type=int, default=100)
    p.add_argument("--o_batch", type=int, default=6)
    p.add_argument("--o_lr", type=float, default=0.001)
    p.add_argument("--o_lr_a", type=float, default=0.01)
    p.add_argument("--o_lamb", type=float, default=3e-4)
    p.add_argument("--o_size", type=int, default=10)

    # fine-tune stage
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lamb", type=float, default=0.003)

    p.add_argument("--num-tasks", type=int, default=4)
    p.add_argument("--maxdisp", type=int, default=192,
                   help="max disparity; cost volume depth = maxdisp // 3 "
                        "(threaded through every stage, unlike the "
                        "reference's dead flag)")

    # router
    p.add_argument("--train-router", action="store_true",
                   help="train the Scene Router after the last task")

    # parallel search
    p.add_argument("--scene-parallel-search", action="store_true",
                   help="run all scenes' independent cell searches at once "
                        "over a 'scene' device mesh axis (needs >= "
                        "num-tasks devices; falls back to sequential)")

    # checkpointing
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--resume", action="store_true")

    # cross-domain / checkpoint-only evaluation
    p.add_argument("--eval-only", action="store_true",
                   help="load --checkpoint-dir and evaluate --eval-lists "
                        "(cross-domain, e.g. KITTI) instead of training")
    p.add_argument("--eval-lists", nargs="*", default=[],
                   help="filename lists to evaluate in --eval-only mode")
    p.add_argument("--eval-task", type=int, default=None,
                   help="fixed task path for --eval-only (default: task 0; "
                        "with --use-router: per-frame routed)")
    p.add_argument("--use-router", action="store_true")
    return p


def eval_only(args):
    """Cross-domain evaluation of a grown checkpoint (KITTI-style lists or
    synthetic fallback)."""
    from rag_tpu.continual.inference import RoutedInference
    from rag_tpu.continual.state import load_checkpoint

    assert args.checkpoint_dir, "--eval-only requires --checkpoint-dir"
    net, manifest = load_checkpoint(args.checkpoint_dir)
    print(f"loaded checkpoint after task {manifest['task']}; "
          f"{len(net.archis)} task paths, {net.size_m():.3f} M params")

    router = None
    if args.use_router:
        from rag_tpu.continual.state import load_router

        router = load_router(args.checkpoint_dir)
        if router is None:
            print("WARNING: no router.npz in the checkpoint dir; routed "
                  "eval needs a driver run with --train-router first. "
                  "Falling back to task-0 paths.")
        else:
            print(f"loaded Scene Router ({router.num_tasks} tasks)")
    engine = RoutedInference(net, router)

    if args.eval_lists:
        from rag_tpu.data.stereo_dataset import StereoDataset

        datasets = [(f, StereoDataset(f, False, root=args.data_root))
                    for f in args.eval_lists]
    else:
        from rag_tpu.data.synthetic import SyntheticStereoDataset

        h, w = args.synthetic_hw
        datasets = [("synthetic", SyntheticStereoDataset(
            args.synthetic_size, h, w, seed=123))]

    task = None if (args.use_router and router is not None) \
        else (args.eval_task or 0)
    for name, ds in datasets:
        scalars = engine.evaluate(ds, task=task)
        print(f"{name}: D1 {100*scalars.get('D1', 0):.2f}% "
              f"EPE {scalars.get('EPE', 0):.3f} "
              f"loss {scalars.get('loss', 0):.3f}")
    return engine


def make_datasets(args):
    if args.synthetic or not args.train_lists:
        from rag_tpu.data.synthetic import SyntheticStereoDataset

        h, w = args.synthetic_hw
        eh, ew = args.synthetic_eval_hw or (h, w)
        n = args.synthetic_size
        en = args.synthetic_eval_size or n
        # per-scene disparity statistics (the 4 weather scenes differ in
        # depth distribution; synthetic scenes differ in disparity range)
        md = lambda t: min(28.0 + 28.0 * t, args.maxdisp * 0.7)
        mk = lambda s, t, hh, ww, nn: SyntheticStereoDataset(
            nn, hh, ww, seed=s, max_disp=md(t))
        train = [mk(10 + t, t, h, w, n) for t in range(args.num_tasks)]
        valid = [mk(20 + t, t, h, w, n) for t in range(args.num_tasks)]
        test = [mk(30 + t, t, eh, ew, en) for t in range(args.num_tasks)]
        return train, valid, test

    from rag_tpu.data.stereo_dataset import StereoDataset

    train = [StereoDataset(f, True, root=args.data_root)
             for f in args.train_lists]
    valid = [StereoDataset(f, False, root=args.data_root)
             for f in args.train_lists]
    test = [StereoDataset(f, False, root=args.data_root)
            for f in args.test_lists or args.train_lists]
    return train, valid, test


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.eval_only:
        return eval_only(args)
    from rag_tpu.continual.driver import (
        ContinualDriver,
        ExperimentConfig,
        TrainConfig,
    )
    from rag_tpu.search.growth import OpSearchConfig
    from rag_tpu.search.mdenas import CellSearchConfig
    from rag_tpu.utils.logging import MetricWriter

    exp_name = f"{args.experiment}_rag_{args.seed}_{args.id}"
    log_dir = os.path.join(args.output, exp_name)
    writer = MetricWriter(log_dir, echo=False)

    cfg = ExperimentConfig(
        cell=CellSearchConfig(epochs=args.c_epochs, batch=args.c_batch,
                              lr=args.c_lr, lr_a=args.c_lr_a,
                              weight_decay=args.c_lamb, seed=args.seed),
        op=OpSearchConfig(epochs=args.o_epochs, batch=args.o_batch,
                          lr=args.o_lr, lr_a=args.o_lr_a,
                          weight_decay=args.o_lamb, o_size=args.o_size,
                          seed=args.seed),
        train=TrainConfig(epochs=args.epochs, batch=args.batch, lr=args.lr,
                          weight_decay=args.lamb),
        num_tasks=args.num_tasks,
        seed=args.seed,
        skip_cell_search=args.skip_cell_search,
        maxdisp=args.maxdisp,
        use_router=args.train_router,
        scene_parallel_search=args.scene_parallel_search,
    )

    if args.variant == "depth":
        from rag_tpu.continual.depth_driver import (
            DepthContinualDriver,
            SyntheticDepthDataset,
        )

        driver = DepthContinualDriver(cfg, writer=writer, log=print,
                                      checkpoint_dir=args.checkpoint_dir or None)
        h, w = args.synthetic_hw
        mk = lambda s: SyntheticDepthDataset(args.synthetic_size, h, w, seed=s)
        train = [mk(10 + t) for t in range(args.num_tasks)]
        valid = [mk(20 + t) for t in range(args.num_tasks)]
        test = [mk(30 + t) for t in range(args.num_tasks)]
    else:
        driver = ContinualDriver(cfg, writer=writer, log=print,
                                 checkpoint_dir=args.checkpoint_dir or None)
        train, valid, test = make_datasets(args)

    tstart = time.time()
    matrix = driver.run(train, valid, test, resume=args.resume)

    if "D1" in matrix.metric_names:
        print("D1 matrix (%):\n" + matrix.format("D1", scale=100, fmt="{:6.2f}"))
        print("EPE matrix:\n" + matrix.format("EPE"))
        print(f"Mean D1 after {args.num_tasks} tasks: "
              f"{100 * matrix.mean_final('D1'):.2f}%")
        print(f"Forgetting (D1): {100 * matrix.forgetting('D1'):.2f}%")
        headline = {"mean_D1": matrix.mean_final("D1"),
                    "D1": matrix.m["D1"].tolist(),
                    "EPE": matrix.m["EPE"].tolist()}
    else:
        print("silog matrix:\n" + matrix.format("silog"))
        print("delta1 matrix:\n" + matrix.format("d1"))
        print(f"Mean silog after {args.num_tasks} tasks: "
              f"{matrix.mean_final('silog'):.3f}")
        headline = {"mean_silog": matrix.mean_final("silog"),
                    "silog": matrix.m["silog"].tolist(),
                    "d1": matrix.m["d1"].tolist()}
    print(f"Model size: {driver.net.size_m():.3f} M params")
    print(f"Elapsed: {(time.time() - tstart) / 3600:.2f} h")

    if driver.router is not None:
        acc = driver.router.accuracy(test)
        print(f"Scene Router accuracy: {100 * acc:.1f}%")

    result = {
        **headline,
        "model_size_m": driver.net.size_m(),
        "elapsed_h": (time.time() - tstart) / 3600,
    }
    with open(os.path.join(log_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    writer.close()
    return matrix


if __name__ == "__main__":
    main()
