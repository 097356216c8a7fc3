#!/usr/bin/env python3
"""ImageNet training CLI — the reference's timm-style train.py surface
(/root/reference/GA/train.py:69-309 + MAP extras /root/reference/MAP/train.py:74-329)
on the TPU-native stack.

Differences from the reference, by design:
- one host process drives ALL local devices (SPMD over a jax Mesh) instead of
  one process per GPU; `--batch-size` stays per-device, `-tb/--total-batch-size`
  keeps its meaning and grad-accumulation is derived identically
  (MAP/train.py:406): accum = tb / (b * n_devices)
- `--amp` selects bf16 compute (no loss scaling needed on TPU)
- `--channels-last`, `--pin-mem`, `--no-prefetcher` are accepted no-ops
  (NHWC + async dispatch are native here)
"""

import argparse
import logging
import os
from datetime import datetime

import yaml

_logger = logging.getLogger("train")

config_parser = argparse.ArgumentParser(description="Training Config", add_help=False)
config_parser.add_argument("-c", "--config", default="", type=str, metavar="FILE",
                           help="YAML config file overriding argparse defaults")

parser = argparse.ArgumentParser(description="ImageNet training (TPU-native)")
# Dataset / model
parser.add_argument("data_dir", metavar="DIR", help="path to dataset (or 'synthetic')")
parser.add_argument("--dataset", "-d", default="", type=str)
parser.add_argument("--train-split", default="train", type=str)
parser.add_argument("--val-split", default="validation", type=str)
parser.add_argument("--model", default="ga_convnext_tiny", type=str)
parser.add_argument("--pretrained", action="store_true", default=False)
parser.add_argument("--initial-checkpoint", default="", type=str,
                    help=".pth.tar (torch) or orbax dir to load weights from")
parser.add_argument("--resume", default="", type=str,
                    help="orbax checkpoint dir to resume full state from")
parser.add_argument("-ri", "--resume-id", default=None, type=str,
                    help="wandb run id to resume logging into (MAP/train.py:412-416)")
parser.add_argument("-fp", "--finetuning-checkpoint", default="", type=str,
                    help="torch .pth.tar to fine-tune from (head fc dropped or remapped)")
parser.add_argument("-pt", "--in21k-to-in1k", action="store_true", default=False,
                    help="remap a 21k-class head to 1k classes (MAP/train.py:462-475)")
parser.add_argument("--in21k-1k-map", "--in21k_1k_map", default="in21k_1k_map.json", type=str)
parser.add_argument("--class-map", default="", type=str, metavar="FILENAME",
                    help="class-to-idx mapping file: one class name per line, "
                         "index = line number (timm load_class_map semantics)")
parser.add_argument("--dataset-download", action="store_true", default=False,
                    help="accepted no-op: datasets are local directories here")
parser.add_argument("--gp", default=None, type=str, metavar="POOL",
                    help="global pool override; factories fix the pooling here, "
                         "so any non-default value fails loudly")
parser.add_argument("--bn-eps", type=float, default=None,
                    help="BN epsilon override; unsupported (fails loudly if set)")
parser.add_argument("--bn-momentum", type=float, default=None,
                    help="BN momentum override; unsupported (fails loudly if set)")
parser.add_argument("--no-resume-opt", action="store_true", default=False)
parser.add_argument("--num-classes", type=int, default=None)
parser.add_argument("--img-size", type=int, default=None)
parser.add_argument("--input-size", default=None, nargs=3, type=int,
                    metavar="N N N", help="C H W (torch order, kept for CLI parity)")
parser.add_argument("--test-input-size", default=None, nargs=3, type=int)
parser.add_argument("--crop-pct", default=None, type=float)
parser.add_argument("--mean", type=float, nargs="+", default=None)
parser.add_argument("--std", type=float, nargs="+", default=None)
parser.add_argument("--interpolation", default="", type=str)
parser.add_argument("-b", "--batch-size", type=int, default=128,
                    help="per-device microbatch size")
parser.add_argument("-tb", "--total-batch-size", type=int, default=None,
                    help="effective global batch per optimizer update")
parser.add_argument("-vb", "--validation-batch-size", type=int, default=None)
# Optimizer
parser.add_argument("--opt", default="lamb", type=str)
parser.add_argument("--opt-eps", default=None, type=float,
                    help="None -> the optimizer's own default (lamb 1e-6, "
                         "adamw 1e-8), as the reference parser (GA/train.py:128)")
parser.add_argument("--opt-betas", default=None, type=float, nargs="+")
parser.add_argument("--momentum", type=float, default=0.9)
parser.add_argument("--weight-decay", type=float, default=0.05)
parser.add_argument("--clip-grad", type=float, default=None)
parser.add_argument("--clip-mode", type=str, default="norm")
# LR schedule
parser.add_argument("--sched", default="cosine", type=str)
parser.add_argument("--lr", type=float, default=5e-3)
parser.add_argument("--warmup-lr", type=float, default=1e-6)
parser.add_argument("--min-lr", type=float, default=1e-5)
parser.add_argument("--epochs", type=int, default=300)
parser.add_argument("--warmup-epochs", type=int, default=5)
parser.add_argument("--cooldown-epochs", type=int, default=10)
parser.add_argument("--decay-epochs", type=float, default=100)
parser.add_argument("--decay-rate", "--dr", type=float, default=0.1)
parser.add_argument("--lr-noise", type=float, nargs="+", default=None, metavar="pct, pct",
                    help="LR noise on/off epoch percentages (GA/train.py:147-148)")
parser.add_argument("--lr-noise-pct", type=float, default=0.67)
parser.add_argument("--lr-noise-std", type=float, default=1.0)
parser.add_argument("--lr-cycle-mul", type=float, default=1.0)
parser.add_argument("--lr-cycle-decay", type=float, default=0.5)
parser.add_argument("--lr-cycle-limit", type=int, default=1)
parser.add_argument("--lr-k-decay", type=float, default=1.0)
parser.add_argument("--patience-epochs", type=int, default=10,
                    help="plateau scheduler only (create_scheduler rejects sched=plateau)")
parser.add_argument("--start-epoch", default=None, type=int,
                    help="manual epoch number (useful on restarts)")
parser.add_argument("--epoch-repeats", type=float, default=0.,
                    help="accepted no-op: inert for folder/map-style datasets in the "
                         "reference too (timm only honors it for iterable datasets)")
# Augmentation & regularization
parser.add_argument("--no-aug", action="store_true", default=False)
parser.add_argument("--scale", type=float, nargs="+", default=[0.08, 1.0])
parser.add_argument("--ratio", type=float, nargs="+", default=[3. / 4., 4. / 3.])
parser.add_argument("--hflip", type=float, default=0.5)
parser.add_argument("--vflip", type=float, default=0.0)
parser.add_argument("--color-jitter", type=float, default=0.4)
parser.add_argument("--aa", type=str, default=None, help="rand augment spec, e.g. rand-m9-mstd0.5-inc1")
parser.add_argument("--smoothing", type=float, default=0.1)
parser.add_argument("--bce-loss", action="store_true", default=False)
parser.add_argument("--bce-target-thresh", type=float, default=None)
parser.add_argument("--jsd-loss", action="store_true", default=False)
parser.add_argument("--train-interpolation", type=str, default="random")
parser.add_argument("--reprob", type=float, default=0.0)
parser.add_argument("--remode", type=str, default="pixel")
parser.add_argument("--recount", type=int, default=1)
parser.add_argument("--mixup", type=float, default=0.0)
parser.add_argument("--cutmix", type=float, default=0.0)
parser.add_argument("--cutmix-minmax", type=float, nargs="+", default=None)
parser.add_argument("--mixup-prob", type=float, default=1.0)
parser.add_argument("--mixup-switch-prob", type=float, default=0.5)
parser.add_argument("--mixup-mode", type=str, default="batch")
parser.add_argument("--mixup-off-epoch", default=0, type=int)
parser.add_argument("--aug-repeats", "--aug-repeat", type=int, default=0)
parser.add_argument("--aug-splits", type=int, default=0,
                    help="augmentation splits (0 or >=2): clean + N-1 "
                         "augmented copies per sample, for --jsd-loss")
parser.add_argument("--resplit", action="store_true", default=False,
                    help="skip random erasing on the clean aug-split")
parser.add_argument("--split-bn", action="store_true", default=False,
                    help="per-aug-split BN batch statistics (timm "
                         "convert_splitbn_model semantics; needs --aug-splits)")
parser.add_argument("--drop", type=float, default=0.0)
parser.add_argument("--drop-connect", type=float, default=None)
parser.add_argument("--drop-path", type=float, default=None)
parser.add_argument("--drop-block", type=float, default=None,
                    help="accepted no-op: swallowed by **kwargs in every reference model "
                         "factory too (e.g. MAP/models/map_resnet.py:445-449)")
# Multi-head losses (GA + MAP)
parser.add_argument("--GA_lam", "--ga-lam", dest="GA_lam", type=float, default=None,
                    help="GA decorrelation lambda (GA/train.py:735-745)")
parser.add_argument("--dec-lam", type=float, default=-0.8,
                    help="MAP cross-group decorrelation lambda (MAP/train.py:823-837)")
parser.add_argument("--distill-tokens", type=int, default=0)
parser.add_argument("--token-distillation", type=int, default=1)
# EMA
parser.add_argument("--model-ema", action="store_true", default=False)
parser.add_argument("--model-ema-decay", type=float, default=0.9999)
parser.add_argument("--model-ema-force-cpu", action="store_true", default=False,
                    help="accepted no-op: EMA lives in device TrainState (no host copy)")
# Misc
parser.add_argument("--seed", type=int, default=42)
parser.add_argument("--worker-seeding", type=str, default="all",
                    help="accepted no-op: host pipeline derives one RNG per sample "
                         "from (seed, epoch, index) regardless")
parser.add_argument("--log-interval", type=int, default=50)
parser.add_argument("--recovery-interval", type=int, default=0)
parser.add_argument("--checkpoint-hist", type=int, default=10)
parser.add_argument("-j", "--workers", type=int, default=4)
parser.add_argument("--grad-accumulation", type=int, default=None,
                    help="explicit grad accumulation (GA-style flag); derived from -tb if unset")
parser.add_argument("--amp", action="store_true", default=False,
                    help="bf16 compute on TPU")
parser.add_argument("--channels-last", action="store_true", default=False,
                    help="accepted no-op: NHWC is the native layout here")
parser.add_argument("--pin-mem", action="store_true", default=False,
                    help="accepted no-op: device transfer is async jax dispatch")
parser.add_argument("--no-prefetcher", action="store_true", default=False,
                    help="accepted no-op: the loader always overlaps host decode with "
                         "device compute")
parser.add_argument("--output", default="", type=str)
parser.add_argument("--experiment", default="", type=str)
parser.add_argument("--project-name", default="imagenet_models_tpu", type=str)
parser.add_argument("--eval-metric", default="top1", type=str)
parser.add_argument("--log-wandb", action="store_true", default=False)
parser.add_argument("--save-images", action="store_true", default=False)
parser.add_argument("--sync-bn", action="store_true", default=False,
                    help="accepted; batch stats are psum-synced every step regardless")
parser.add_argument("--dist-bn", type=str, default="reduce",
                    help="accepted no-op: batch stats are pmean-synced every step "
                         "(strictly stronger than per-epoch reduce/broadcast)")
parser.add_argument("--zero1", action="store_true", default=False,
                    help="shard optimizer + EMA state over the data axis "
                         "(ZeRO-1; TPU-native extension, no reference analog — "
                         "DDP replicates optimizer state per GPU)")
parser.add_argument("--early-stop", type=int, default=None)
parser.add_argument("--eval-epoch", type=int, default=1)
parser.add_argument("--dis_eval", "--dis-eval", action="store_true", default=False)
parser.add_argument("--torchcompile", nargs="?", type=str, default=None, const="inductor",
                    help="accepted no-op: everything is jax.jit compiled")
# torch-runtime flags accepted for CLI parity; each is either native here
# (bf16 AMP, jit, NHWC, persistent workers) or CUDA/DDP-process specific
parser.add_argument("--apex-amp", action="store_true", default=False,
                    help="reference AMP impl selector; enables --amp (bf16) here")
parser.add_argument("--native-amp", action="store_true", default=False,
                    help="reference AMP impl selector; enables --amp (bf16) here")
parser.add_argument("--torchscript", action="store_true", default=False,
                    help="accepted no-op: everything is jax.jit compiled")
parser.add_argument("--fuser", default="", type=str,
                    help="accepted no-op: XLA does the fusion")
parser.add_argument("--no-ddp-bb", action="store_true", default=False,
                    help="accepted no-op: no DDP broadcast buffers in SPMD")
parser.add_argument("--use-multi-epochs-loader", action="store_true", default=False,
                    help="accepted no-op: loader workers persist across epochs")
parser.add_argument("--local_rank", default=0, type=int,
                    help="accepted no-op: one host process drives all devices")
parser.add_argument("--tta", type=int, default=0,
                    help="average eval logits over groups of N consecutive samples "
                         "(MAP/train.py:1009-1012 output.unfold semantics)")
# flags the reference parses but never consumes (MAP/train.py:246-329);
# accepted and warned-on so reference command lines keep working
parser.add_argument("--mesa", type=float, default=0.0)
parser.add_argument("--mesa-start-ratio", type=float, default=0.25,
                    help="parsed with --mesa; warns unsupported when mesa>0")
parser.add_argument("--prog-input", type=float, nargs="+", default=None)
parser.add_argument("--prog-input-milestones", type=float, nargs="+", default=None)
parser.add_argument("--head-dropout", type=float, default=None)
parser.add_argument("--n-devices", type=int, default=None,
                    help="limit the mesh to the first N local devices")
# multi-host DP: one process per host, same command everywhere (the
# torchrun/init_process_group analog, GA/train.py:374-381). On TPU pods the
# three flags can be omitted (jax.distributed auto-detects the slice).
parser.add_argument("--dist-coordinator", type=str, default="",
                    help="multi-host rendezvous address host:port, or 'auto' "
                         "to let jax.distributed detect the TPU-pod slice; "
                         "enables jax.distributed.initialize")
parser.add_argument("--dist-num-processes", type=int, default=None,
                    help="total process count for --dist-coordinator")
parser.add_argument("--dist-process-id", type=int, default=None,
                    help="this process's rank for --dist-coordinator")
parser.add_argument("--max-steps-per-epoch", type=int, default=None,
                    help="truncate epochs (smoke runs)")
parser.add_argument("--profile-steps", type=int, default=0,
                    help="capture a jax.profiler device trace of N steps in epoch 0")


def _parse_args(args_list=None):
    args_config, remaining = config_parser.parse_known_args(args_list)
    if args_config.config:
        with open(args_config.config) as f:
            cfg = yaml.safe_load(f)
        parser.set_defaults(**cfg)
    args = parser.parse_args(remaining if args_list is None else remaining)
    args_text = yaml.safe_dump(args.__dict__, default_flow_style=False)
    return args, args_text


def run(args, args_text: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import imagenet_models_tpu.models  # noqa: F401  (register zoo)
    from imagenet_models_tpu import create_model
    from imagenet_models_tpu.core.registry import default_cfg
    from imagenet_models_tpu.ckpt.pretrained import load_variables_from_torch
    from imagenet_models_tpu.ckpt.saver import CheckpointSaver, resume_checkpoint
    from imagenet_models_tpu.data.dataset import create_dataset
    from imagenet_models_tpu.data.loader import create_loader
    from imagenet_models_tpu.data.mixup import Mixup
    from imagenet_models_tpu.parallel.mesh import data_mesh
    from imagenet_models_tpu.train.engine import (
        NaNWatchdog, Preempted, install_preemption_handler, train_one_epoch, validate)
    from imagenet_models_tpu.train.losses import create_loss_fn
    from imagenet_models_tpu.train.optim import create_optimizer
    from imagenet_models_tpu.train.scheduler import create_scheduler
    from imagenet_models_tpu.train.state import (
        create_train_state, make_eval_step, make_train_step, place_state)
    from imagenet_models_tpu.utils.meters import setup_default_logging, update_summary
    from imagenet_models_tpu.core.setup import jit_init, setup_jax

    setup_default_logging()
    setup_jax()
    if args.dist_coordinator:
        from imagenet_models_tpu.parallel.mesh import init_distributed

        init_distributed(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)
    n_proc, proc_id = jax.process_count(), jax.process_index()
    install_preemption_handler()
    devices = jax.devices()
    if args.n_devices:
        if n_proc > 1:
            raise ValueError("--n-devices cannot be combined with multi-host "
                             "runs (the mesh must cover every process's chips)")
        devices = devices[: args.n_devices]
    mesh = data_mesh(devices)
    n_dev = len(devices)
    _logger.info("Training SPMD over %d %s device(s), %d process(es)",
                 n_dev, devices[0].platform, n_proc)

    cfg = default_cfg(args.model)
    num_classes = args.num_classes or cfg["num_classes"]
    input_size = (args.input_size[1] if args.input_size else (args.img_size or cfg["input_size"][0]))
    test_size = args.test_input_size[1] if args.test_input_size else input_size
    crop_pct = args.crop_pct or cfg["crop_pct"]
    interpolation = args.interpolation or cfg["interpolation"]
    mean = tuple(args.mean) if args.mean else cfg["mean"]
    std = tuple(args.std) if args.std else cfg["std"]

    # aug-splits / JSD (GA/train.py:433-441,554,560-561,613-615 via timm):
    # each sample yields a clean + N-1 augmented copies of one primary crop;
    # JSD loss = CE(clean) + alpha*mean KL(split ‖ mixture). Incompatible
    # with mixup collate; split-BN model surgery is not supported.
    num_aug_splits = 0
    if args.aug_splits > 0:
        if args.aug_splits <= 1:
            raise ValueError("A split of 1 makes no sense")  # GA/train.py:435
        num_aug_splits = args.aug_splits
    if args.jsd_loss and num_aug_splits <= 1:
        raise ValueError("--jsd-loss is only valid with --aug-splits >= 2 "
                         "(GA/train.py:614)")
    if args.resplit and not num_aug_splits:
        raise NotImplementedError(
            "--resplit without --aug-splits (timm's erase-second-half-batch "
            "mode) is not supported; none of the reference recipes use it")
    if args.split_bn:
        # timm convert_splitbn_model (GA/train.py:439-441): per-split BN batch
        # statistics; clean split feeds the running stats. Trace-time global
        # read by nn.layers.BatchNorm (must be set before the first jit).
        if num_aug_splits <= 1:
            raise ValueError(
                "--split-bn requires --aug-splits >= 2 (GA/train.py:439)")
        if args.sync_bn:
            raise ValueError(
                "--split-bn and --sync-bn are mutually exclusive "
                "(GA/train.py:449 'assert not args.split_bn')")
        from imagenet_models_tpu.nn.layers import set_bn_splits

        set_bn_splits(max(num_aug_splits, 2))
    if args.apex_amp or args.native_amp:
        # reference AMP-implementation selectors; the one AMP here is bf16
        args.amp = True
    if args.gp is not None:
        raise NotImplementedError(
            f"--gp {args.gp}: pooling is fixed by the model factory here "
            "(mmcap for map_*/ga_* models, avg otherwise)")
    if args.bn_eps is not None or args.bn_momentum is not None:
        raise NotImplementedError(
            "--bn-eps/--bn-momentum overrides are not supported; BN eps "
            "values are fixed per-model for checkpoint parity")
    if args.mesa or args.prog_input or args.prog_input_milestones or \
            args.head_dropout is not None:
        _logger.warning("--mesa/--prog-input*/--head-dropout are parsed but "
                        "never consumed by the reference engine "
                        "(MAP/train.py:246-329); ignoring them here too")
    drop_path = args.drop_path
    if args.drop_connect is not None:
        # timm maps the deprecated --drop-connect onto drop_path with a warning
        _logger.warning("--drop-connect is deprecated; using it as drop-path rate")
        if drop_path is None:
            drop_path = args.drop_connect

    dtype = jnp.bfloat16 if args.amp else None
    model_kwargs = {}
    if args.distill_tokens:
        # extra distill tokens in every CAP; training emits 3-output heads
        # consumed by the distill loss branch (MAP/train.py:797-806)
        model_kwargs["distill_tokens"] = args.distill_tokens
    model = create_model(args.model, num_classes=num_classes,
                         drop_rate=args.drop, drop_path_rate=drop_path, dtype=dtype,
                         **model_kwargs)

    # batch geometry (MAP/train.py:406 semantics; world == n_devices)
    per_dev = args.batch_size
    if args.grad_accumulation:
        grad_accum = args.grad_accumulation
    elif args.total_batch_size:
        grad_accum = max(1, args.total_batch_size // (per_dev * n_dev))
    else:
        grad_accum = 1
    global_batch = per_dev * n_dev * grad_accum
    _logger.info("global batch %d = %d/dev x %d dev x %d accum",
                 global_batch, per_dev, n_dev, grad_accum)

    # data
    from imagenet_models_tpu.data.dataset import check_dataset_name

    check_dataset_name(args.dataset)
    dataset_train = create_dataset(args.data_dir, args.train_split,
                                   num_classes=num_classes, image_size=input_size,
                                   class_map=args.class_map or None)
    dataset_eval = create_dataset(args.data_dir, args.val_split,
                                  num_classes=num_classes, image_size=test_size,
                                  class_map=args.class_map or None)
    mixup_active = (args.mixup > 0 or args.cutmix > 0
                    or args.cutmix_minmax is not None)  # GA/train.py:547
    if mixup_active and num_aug_splits:
        # collate conflict, as in the reference (GA/train.py:554)
        raise ValueError("--aug-splits is not compatible with mixup/cutmix; "
                         "set --mixup 0 --cutmix 0")
    mixup_fn = None
    if mixup_active:
        mixup_fn = Mixup(mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
                         cutmix_minmax=args.cutmix_minmax,
                         prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
                         label_smoothing=args.smoothing, num_classes=num_classes,
                         mode=args.mixup_mode)
    loader_train = create_loader(
        dataset_train, input_size, global_batch, is_training=True,
        # no-aug forces the eval interpolation (GA/train.py:565: 'random'
        # is not a valid deterministic resize)
        interpolation=interpolation if args.no_aug
        else (args.train_interpolation or interpolation),
        mean=mean, std=std, auto_augment=args.aa, hflip=args.hflip,
        vflip=args.vflip, color_jitter=args.color_jitter,
        reprob=args.reprob, remode=args.remode, recount=args.recount,
        scale=tuple(args.scale), ratio=tuple(args.ratio), mixup_fn=mixup_fn,
        num_workers=args.workers, seed=args.seed, repeats=args.aug_repeats,
        aug_splits=num_aug_splits, resplit=args.resplit, no_aug=args.no_aug,
        num_shards=n_proc, shard_id=proc_id)
    eval_batch = args.validation_batch_size or per_dev * n_dev
    quantum = n_dev * max(int(args.tta), 1)  # tta groups must tile the device shard
    eval_batch = max(quantum, eval_batch // quantum * quantum)
    loader_eval = create_loader(dataset_eval, test_size, eval_batch,
                                is_training=False, interpolation=interpolation,
                                crop_pct=crop_pct,
                                crop_mode=cfg.get("crop_mode", "center"),
                                mean=mean, std=std,
                                num_workers=args.workers, seed=args.seed,
                                num_shards=n_proc, shard_id=proc_id)

    # init
    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    x0 = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = jit_init(model, init_rng, x0, training=False)
    from imagenet_models_tpu.core.reinit import reference_init

    # family-specific reference init schemes (kaiming/torch-default families;
    # no-op for convnext/maxvit) — matters for from-scratch training only
    variables = reference_init(args.model, variables, seed=args.seed)
    if args.pretrained:
        # reference passes pretrained= to create_model (GA/train.py:409);
        # with no egress this resolves against local released checkpoints
        from imagenet_models_tpu.ckpt.pretrained import require_local_pretrained

        pre_path = require_local_pretrained(args.model)
        variables = load_variables_from_torch(args.model, variables, pre_path)
        _logger.info("loaded pretrained weights %s", pre_path)
    if args.initial_checkpoint:
        if args.initial_checkpoint.endswith((".pth", ".pth.tar", ".pt")):
            variables = load_variables_from_torch(args.model, variables, args.initial_checkpoint)
        else:
            restored, _ = resume_checkpoint(args.initial_checkpoint, variables)
            variables = restored
        _logger.info("loaded initial checkpoint %s", args.initial_checkpoint)
    if args.finetuning_checkpoint:
        from imagenet_models_tpu.ckpt.finetune import apply_finetune_checkpoint

        variables, n_fc = apply_finetune_checkpoint(
            variables, args.model, args.finetuning_checkpoint,
            in21k_to_in1k=args.in21k_to_in1k, map_path=args.in21k_1k_map)
        _logger.info("fine-tuning from %s (%d fc keys %s)", args.finetuning_checkpoint,
                     n_fc, "remapped" if args.in21k_to_in1k else "dropped")
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    _logger.info("Model %s created, param count: %d", args.model, n_params)

    # optimizer + schedule
    steps_per_epoch = len(loader_train)
    from imagenet_models_tpu.train.scheduler import lr_noise_table

    noise_range = [n * args.epochs for n in args.lr_noise] if args.lr_noise else None
    noise_table = lr_noise_table(args.epochs + args.cooldown_epochs + 1, noise_range,
                                 noise_pct=args.lr_noise_pct,
                                 noise_std=args.lr_noise_std, seed=args.seed)
    lr_fn = create_scheduler(args.sched, base_lr=args.lr, epochs=args.epochs,
                             warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
                             min_lr=args.min_lr, decay_epochs=args.decay_epochs,
                             decay_rate=args.decay_rate, cycle_mul=args.lr_cycle_mul,
                             cycle_decay=args.lr_cycle_decay,
                             cycle_limit=args.lr_cycle_limit,
                             k_decay=args.lr_k_decay, noise_table=noise_table)
    betas = tuple(args.opt_betas) if args.opt_betas else (0.9, 0.999)
    tx = create_optimizer(args.opt, learning_rate=lambda s: lr_fn(s // max(steps_per_epoch, 1)),
                          weight_decay=args.weight_decay, eps=args.opt_eps, betas=betas,
                          momentum=args.momentum, clip_grad=args.clip_grad,
                          clip_mode=args.clip_mode)

    ema_decay = args.model_ema_decay if args.model_ema else 0.0
    state = create_train_state(variables, tx, ema_decay=ema_decay)
    start_epoch = 0
    from imagenet_models_tpu.train.optim import set_schedule_count

    if args.resume:
        state, last_epoch = resume_checkpoint(args.resume, state)
        start_epoch = last_epoch + 1
        if args.no_resume_opt:
            # reference: optimizer/loss-scaler state not restored
            # (MAP/train.py:552-553); weights/EMA/epoch still are — and the
            # LR schedule continues from the resume epoch (timm steps it by
            # epoch outside the optimizer)
            state = state.replace(opt_state=set_schedule_count(
                tx.init(state.params), start_epoch * steps_per_epoch))
            _logger.info("resumed weights only (--no-resume-opt)")
        else:
            # timm steps the LR scheduler by epoch, outside the optimizer:
            # re-point the schedule counter at the resume epoch so a
            # mid-epoch recovery snapshot (epoch-1 semantics re-runs the
            # interrupted epoch) or a changed batch size cannot drift the
            # cosine; Adam/LAMB moment bias-correction counts are untouched
            state = state.replace(opt_state=set_schedule_count(
                state.opt_state, start_epoch * steps_per_epoch))
        _logger.info("resumed from %s at epoch %d", args.resume, start_epoch)
    if args.start_epoch is not None:
        # manual epoch override (GA/train.py:169-170 semantics); the applied
        # LR must follow the override, not the in-state counter
        start_epoch = args.start_epoch
        state = state.replace(opt_state=set_schedule_count(
            state.opt_state, start_epoch * steps_per_epoch))
    state = place_state(state, mesh, zero1=args.zero1)

    base_loss = create_loss_fn(bce_loss=args.bce_loss, smoothing=args.smoothing,
                               bce_target_thresh=args.bce_target_thresh,
                               mixup_active=mixup_active,
                               jsd_splits=num_aug_splits if args.jsd_loss else 0)
    dec_lam = args.GA_lam if args.GA_lam is not None else args.dec_lam
    step_fn = make_train_step(model, tx, base_loss, dec_lam=dec_lam,
                              ema_decay=ema_decay, grad_accum=grad_accum, mesh=mesh,
                              token_distillation=bool(args.token_distillation),
                              zero1=args.zero1)
    eval_step = make_eval_step(model, mesh=mesh, tta=args.tta)
    eval_step_ema = (make_eval_step(model, mesh=mesh, use_ema=True, tta=args.tta)
                     if ema_decay else None)

    # output dir + saver
    run_name = args.experiment or "-".join([
        datetime.now().strftime("%Y%m%d-%H%M%S"), args.model, str(input_size)])
    if n_proc > 1:
        # every process must use process-0's run name: orbax saves are
        # collective over one shared checkpoint path, and datetime.now()
        # can straddle a second boundary across hosts
        from jax.experimental import multihost_utils

        buf = np.zeros(128, np.uint8)
        enc = run_name.encode()[:128]
        buf[:len(enc)] = np.frombuffer(enc, np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        run_name = bytes(buf[buf != 0]).decode()
    output_dir = os.path.join(args.output or "./output/train", run_name)
    saver = CheckpointSaver(output_dir, max_history=args.checkpoint_hist,
                            decreasing=args.eval_metric == "loss", args_text=args_text,
                            # single-process: overlap checkpoint writes with
                            # the next train steps (multi-host saves are
                            # collective and must stay on the callers)
                            async_save=n_proc == 1)
    _logger.info("output dir: %s", output_dir)

    log_wandb = False
    if args.log_wandb and proc_id == 0:  # master-only, MAP/train.py:724-738
        from imagenet_models_tpu.utils.meters import init_wandb

        log_wandb = init_wandb(f"{args.project_name}_{os.path.basename(args.data_dir).lower()}",
                               run_name, vars(args), resume_id=args.resume_id)

    # timm semantics: the run is cosine-cycle length + cooldown epochs; the
    # cosine schedule holds min_lr over the cooldown tail (timm train.py
    # num_epochs = get_cycle_length() + cooldown_epochs)
    num_epochs = args.epochs + (args.cooldown_epochs if args.sched == "cosine" else 0)
    best_metric, best_epoch = None, None
    wrote_header = False
    try:
        for epoch in range(start_epoch, num_epochs):
            loader_train.set_epoch(epoch)
            mixup_off = bool(args.mixup_off_epoch and epoch >= args.mixup_off_epoch)
            state, rng, train_metrics = train_one_epoch(
                epoch, state, step_fn, _truncate(loader_train, args.max_steps_per_epoch),
                mesh, rng, log_interval=args.log_interval, saver=saver,
                recovery_interval=args.recovery_interval, lr_fn=lr_fn,
                mixup_off=mixup_off, steps_per_epoch=steps_per_epoch,
                profile_steps=args.profile_steps,
                profile_dir=os.path.join(output_dir, "profile"),
                save_images_dir=output_dir if args.save_images else "")

            do_eval = not args.dis_eval and (epoch + 1) >= args.eval_epoch
            # keep the column set stable from row 0: with EMA on, eval rows
            # carry raw_* extras, and summary.csv's header is written once
            eval_metrics = {"top1": 0.0, "top5": 0.0}
            if eval_step_ema is not None:
                eval_metrics.update({"raw_top1": 0.0, "raw_top5": 0.0})
            if do_eval:
                loader_eval_t = _truncate(loader_eval, args.max_steps_per_epoch)
                eval_metrics = validate(state, eval_step, loader_eval_t, mesh,
                                        log_interval=args.log_interval, tta=args.tta)
                if eval_step_ema is not None:
                    ema_metrics = validate(state, eval_step_ema, loader_eval_t, mesh,
                                           log_interval=args.log_interval, log_suffix=" (EMA)",
                                           tta=args.tta)
                    # reference semantics: EMA metrics are THE eval metrics
                    # (GA/train.py:670-679); keep the raw-model numbers as extra
                    # columns so short runs (EMA still lagging) stay legible.
                    eval_metrics = {**ema_metrics,
                                    "raw_top1": eval_metrics["top1"],
                                    "raw_top5": eval_metrics["top5"]}
            if proc_id == 0:  # master-only summary/wandb (MAP/train.py:724-738)
                update_summary(epoch, train_metrics, eval_metrics,
                               os.path.join(output_dir, "summary.csv"),
                               write_header=not wrote_header,
                               lr=float(lr_fn(epoch)), log_wandb=log_wandb)
                wrote_header = True
            if do_eval:
                best_metric, best_epoch = saver.save_checkpoint(
                    state, epoch, metric=eval_metrics[args.eval_metric])
            else:
                saver.save_checkpoint(state, epoch)
            if args.early_stop is not None and epoch == args.early_stop - 1 \
                    and eval_metrics["top1"] < 72.8:
                _logger.info("early stop: top1 %.2f < 72.8 at epoch %d",
                             eval_metrics["top1"], epoch)
                return
    except NaNWatchdog as e:
        _logger.error("NaN watchdog fired (%s); exiting for restart via --resume", e)
        return
    except Preempted as e:
        _logger.warning("preempted (%s); recovery checkpoint saved — restart "
                        "with --resume %s", e, os.path.join(output_dir, "recovery"))
        return
    except KeyboardInterrupt:
        pass
    finally:
        # land every queued async write before the process reports its exit
        # reason (the recovery-save messages above promise a usable dir)
        saver.wait_until_finished()
    if best_metric is not None:
        _logger.info("*** Best metric: %s (epoch %s)", best_metric, best_epoch)


class _truncate:
    """Wrap a loader to cap steps per epoch (smoke/bench runs).

    Reads AND writes of loader attributes (batch_size, mixup_enabled, ...)
    are forwarded to the wrapped loader so engine-side toggles like
    `--mixup-off-epoch` reach the real DataLoader."""

    _own = ("loader", "max_steps")

    def __init__(self, loader, max_steps):
        object.__setattr__(self, "loader", loader)
        object.__setattr__(self, "max_steps", max_steps)

    def __getattr__(self, name):
        return getattr(self.loader, name)

    def __setattr__(self, name, value):
        if name in self._own:
            object.__setattr__(self, name, value)
        else:
            setattr(self.loader, name, value)

    def __len__(self):
        n = len(self.loader)
        return min(n, self.max_steps) if self.max_steps else n

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if self.max_steps and i >= self.max_steps:
                return
            yield b


def main():
    args, args_text = _parse_args()
    run(args, args_text)


if __name__ == "__main__":
    main()
