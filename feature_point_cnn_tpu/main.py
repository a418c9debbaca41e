"""Command-line entry point.

Covers the reference CLI (`/root/reference/python/main.py`):

  python -m feature_point_cnn_tpu.main train --synthetic-path D      # MagicPoint
  python -m feature_point_cnn_tpu.main train --coco-path D --generate-points \
      --magic-point-weights CKPT                                     # self-label
  python -m feature_point_cnn_tpu.main train --coco-path D \
      --magic-point-weights CKPT                                     # SuperPoint
  python -m feature_point_cnn_tpu.main train --coco-path D --magic-point
  python -m feature_point_cnn_tpu.main inference --weights-path CKPT [--source 0]
  python -m feature_point_cnn_tpu.main export --weights-path CKPT --out model.shlo

Weights paths are orbax checkpoint *directories* (see utils/checkpoint.py).
"""

from __future__ import annotations

import argparse

from feature_point_cnn_tpu.config import SuperPointConfig


def build_parser() -> argparse.ArgumentParser:
    cfg = SuperPointConfig()
    p = argparse.ArgumentParser(description="TPU-native SuperPoint framework")
    p.add_argument("--H", type=int, default=480)
    p.add_argument("--W", type=int, default=640)
    p.add_argument("--nms-dist", type=int, default=cfg.nms_dist)
    p.add_argument("--conf-thresh", type=float, default=cfg.confidence_thresh)
    p.add_argument("--nn-thresh", type=float, default=cfg.nn_thresh)
    p.add_argument("--max-keypoints", type=int, default=cfg.max_keypoints)
    p.add_argument("--no-write-statistics", action="store_true")

    sub = p.add_subparsers(dest="run_mode", required=True)

    inf = sub.add_parser("inference")
    inf.add_argument("--weights-path", required=True,
                     help="orbax checkpoint directory")
    inf.add_argument("--source", default="synthetic",
                     help="'synthetic', camera id, or video path")
    inf.add_argument("--max-frames", type=int, default=0)
    inf.add_argument("--no-show", action="store_true")

    tr = sub.add_parser("train")
    tr.add_argument("--checkpoint-path", default="checkpoints")
    tr.add_argument("--batch-size", type=int, default=cfg.batch_size)
    tr.add_argument("--grad-accum-steps", type=int, default=1,
                    help="optax.MultiSteps accumulation across FULL batches")
    tr.add_argument("--steps-per-call", type=int, default=1,
                    help="chain k optimizer steps inside one jitted "
                         "lax.scan dispatch (device-resident data only): "
                         "amortizes the per-dispatch host/relay round trip")
    tr.add_argument("--microbatch-steps", type=int, default=1,
                    help="lax.scan microbatching inside the jitted step -- "
                         "splits each batch into k sequential microbatches, "
                         "cutting activation memory ~k-fold (the reference's "
                         "batch_size_divider, settings.py:19)")
    tr.add_argument("--epochs", type=int, default=cfg.epochs)
    tr.add_argument("--magic-point", action="store_true")
    tr.add_argument("--synthetic-path")
    tr.add_argument("--coco-path")
    tr.add_argument("--generate-points", action="store_true")
    tr.add_argument("--relabel", action="store_true",
                    help="with --generate-points: regenerate labels even "
                         "for items that already have an output npz (the "
                         "default SKIPS them, which resumes an interrupted "
                         "run but would silently keep labels from an older "
                         "model)")
    tr.add_argument("--magic-point-weights", default="checkpoints_magicpoint")
    tr.add_argument("--limit", type=int, default=0,
                    help="cap items for self-labeling (debug)")
    tr.add_argument("--shard-index", type=int, default=0,
                    help="self-labeling: this host's shard of the file "
                         "list (embarrassingly parallel across hosts)")
    tr.add_argument("--num-shards", type=int, default=1,
                    help="self-labeling: total hosts sharding the file list")
    tr.add_argument("--descriptor-loss", default=cfg.descriptor_loss,
                    choices=["hinge", "hinge_hn", "mse"],
                    help="joint-phase descriptor loss (train/loss.py): the "
                         "reference hinge, the hard-negative-mined cosine "
                         "hinge, or the reference's dead MSE alternative")
    tr.add_argument("--photometric-augment", action="store_true",
                    help="on-device photometric augmentation during "
                         "training (noise/blur/contrast; data/photometric.py)")
    tr.add_argument("--snapshot-path", default=None,
                    help="write a portable single-file .npz weight snapshot "
                         "(utils/weights.py) here after EVERY epoch save — "
                         "git-committable insurance against environment "
                         "resets destroying the orbax checkpoint dir")
    tr.add_argument("--data-placement", default="auto",
                    choices=("auto", "device", "host"),
                    help="'device' keeps the whole packed dataset resident "
                         "in HBM and gathers batches on-chip "
                         "(data/device_store.py); 'auto' picks it whenever "
                         "the packed split fits")

    ex = sub.add_parser("export")
    ex.add_argument("--weights-path", required=True)
    ex.add_argument("--out", default="superpoint_extract.shlo")
    ex.add_argument("--raw-weights", default=None,
                    help="also write a portable single-file .npz weight "
                         "snapshot (utils/weights.py) — git-committable, "
                         "loadable anywhere --weights-path is accepted")
    ex.add_argument("--pjrt-out", default=None,
                    help="export a PJRT serving bundle (module.mlir + "
                         "compile_options.pb + meta.json) for the native "
                         "csrc/superpoint_serve app instead of bare "
                         "StableHLO")
    ex.add_argument("--abi", default="packed", choices=["full", "packed"])
    ex.add_argument("--top-n", type=int, default=256)
    ex.add_argument("--batch", type=int, default=1,
                    help="frames per PJRT execute (packed only): amortizes "
                         "the host round trip like the Python bench")
    ex.add_argument("--fold-bn", action="store_true",
                    help="fold BatchNorms into conv kernel+bias at export "
                         "(models/fold.py)")
    ex.add_argument("--input-dtype", default="f32", choices=["f32", "u8"],
                    help="u8 takes raw uint8 pixels, normalized on device "
                         "(4x smaller image upload)")
    ex.add_argument("--gray", action="store_true",
                    help="1-channel ABI input, broadcast to the model's 3 "
                         "channels on device (3x smaller image upload)")
    return p


def config_from_args(opt) -> SuperPointConfig:
    cfg = SuperPointConfig(
        nms_dist=opt.nms_dist,
        confidence_thresh=opt.conf_thresh,
        nn_thresh=opt.nn_thresh,
        max_keypoints=opt.max_keypoints,
    )
    if opt.run_mode == "train":
        if opt.batch_size % opt.microbatch_steps != 0:
            raise SystemExit(
                f"--batch-size {opt.batch_size} must be divisible by "
                f"--microbatch-steps {opt.microbatch_steps}"
            )
        cfg = cfg.replace(
            batch_size=opt.batch_size,
            grad_accum_steps=opt.grad_accum_steps,
            microbatch_steps=opt.microbatch_steps,
            train_steps_per_call=opt.steps_per_call,
            epochs=opt.epochs,
            photometric_augment=opt.photometric_augment,
            descriptor_loss=opt.descriptor_loss,
        )
    return cfg


def _loaders(cfg, path, test_size: int = 0, device_resident: str = "auto"):
    from feature_point_cnn_tpu.data.device_store import make_loader
    from feature_point_cnn_tpu.data.packed import open_dataset

    train = make_loader(
        open_dataset(path, "train"), cfg.batch_size, cfg.max_points,
        device_resident=device_resident,
    )
    # cap the test split like the reference's SuperPoint trainer
    # (`superpointtrainer.py:11`: 1000 items) so per-epoch eval stays cheap
    test = make_loader(
        open_dataset(path, "test", size=test_size), cfg.batch_size,
        cfg.max_points, shuffle=False, device_resident=device_resident,
    )
    return train, test


def main(argv=None) -> None:
    opt = build_parser().parse_args(argv)
    cfg = config_from_args(opt)

    from feature_point_cnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if opt.run_mode == "inference":
        from feature_point_cnn_tpu.inference.demo import run_demo

        stats = run_demo(
            opt.weights_path, cfg, source=opt.source,
            width=opt.W, height=opt.H,
            max_frames=opt.max_frames, show=not opt.no_show,
        )
        print(stats)

    elif opt.run_mode == "export":
        from feature_point_cnn_tpu.inference.wrapper import SuperPointFrontend

        if opt.fold_bn:
            cfg = cfg.replace(fold_bn=True)
        frontend = SuperPointFrontend(cfg, checkpoint_dir=opt.weights_path)
        if opt.pjrt_out:
            frontend.export_pjrt(
                opt.pjrt_out, (opt.H, opt.W), abi=opt.abi, top_n=opt.top_n,
                batch=opt.batch, input_dtype=opt.input_dtype,
                input_channels=1 if opt.gray else None,
            )
        else:
            frontend.export_stablehlo(opt.out, (opt.H, opt.W))
        if opt.raw_weights:
            from feature_point_cnn_tpu.utils.weights import save_weights

            if opt.fold_bn:
                # the frontend folded BN into conv params at load (no
                # batch_stats left); the portable snapshot contract keeps
                # the UNFOLDED topology, so reload without the fold
                snap_vars = SuperPointFrontend(
                    cfg.replace(fold_bn=False),
                    checkpoint_dir=opt.weights_path,
                ).variables
            else:
                snap_vars = frontend.variables
            save_weights(opt.raw_weights, snap_vars)
            print(f"[export] raw weights -> {opt.raw_weights}")

    elif opt.run_mode == "train":
        from feature_point_cnn_tpu.train.trainer import Trainer

        write_stats = not opt.no_write_statistics
        placement = {"auto": "auto", "device": "on", "host": "off"}[
            opt.data_placement
        ]
        if opt.synthetic_path:
            print("MagicPoint training on synthetic shapes...")
            train, test = _loaders(cfg, opt.synthetic_path,
                                    device_resident=placement)
            Trainer(
                cfg, "magicpoint", train, test,
                checkpoint_dir=opt.checkpoint_path,
                write_statistics=write_stats,
                snapshot_path=opt.snapshot_path,
            ).train()
        elif opt.coco_path and opt.generate_points:
            print("Self-labeling COCO with homography adaptation...")
            from feature_point_cnn_tpu.selflabel.coco import preprocess_coco

            preprocess_coco(
                opt.coco_path, opt.magic_point_weights, cfg, limit=opt.limit,
                shard_index=opt.shard_index, num_shards=opt.num_shards,
                skip_existing=not opt.relabel,
            )
        elif opt.coco_path and opt.magic_point:
            print("MagicPoint training on labeled COCO...")
            train, test = _loaders(cfg, opt.coco_path,
                                    device_resident=placement)
            Trainer(
                cfg, "magicpoint", train, test,
                checkpoint_dir=opt.checkpoint_path,
                write_statistics=write_stats,
                snapshot_path=opt.snapshot_path,
            ).train()
        elif opt.coco_path:
            print("SuperPoint joint training...")
            train, test = _loaders(cfg, opt.coco_path, test_size=1000,
                                    device_resident=placement)
            Trainer(
                cfg, "superpoint", train, test,
                checkpoint_dir=opt.checkpoint_path,
                magicpoint_checkpoint_dir=opt.magic_point_weights,
                write_statistics=write_stats,
                snapshot_path=opt.snapshot_path,
            ).train()
        else:
            raise SystemExit(
                "train requires --synthetic-path or --coco-path"
            )


if __name__ == "__main__":
    main()
