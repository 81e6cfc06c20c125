"""Training CLI.

Rebuild of the reference's tools/train.py (reference: tools/train.py:115-255)
preserving the config-driven public API:
    python tools/train.py CONFIG [--work-dir D] [--load-from CKPT]
        [--resume-from CKPT] [--auto-resume] [--seed N]
        [--cfg-options k=v ...]
No torch.distributed.launch equivalent is needed: one process drives all
local TPU chips through the mesh (GSPMD data parallelism).
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description='Train a segmentor (TPU)')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--work-dir', help='dir to save logs and ckpts')
    parser.add_argument('--load-from', help='initial weights (.pth or orbax)')
    parser.add_argument('--resume-from', help='checkpoint to resume from')
    parser.add_argument('--auto-resume', action='store_true')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--diff-seed', action='store_true',
                        help='fold the process index into the seed so '
                             'each host draws distinct randomness '
                             '(reference --diff_seed)')
    parser.add_argument('--deterministic', action='store_true',
                        help='accepted for reference-CLI parity; XLA '
                             'compilation is already deterministic (the '
                             'reference flag toggles cuDNN autotune)')
    parser.add_argument('--max-iters', type=int, default=None,
                        help='override runner.max_iters')
    parser.add_argument('--no-validate', action='store_true')
    parser.add_argument('--model-parallel', type=int, default=1,
                        help='tensor-parallel mesh axis size (Megatron-'
                             'style shardings from parallel/tp.py; 1 = '
                             'pure data parallelism, the reference '
                             'semantics)')
    parser.add_argument('--zero3', action='store_true',
                        help='ZeRO-3/FSDP weight+optimizer sharding over '
                             'the data axis (parallel/tp.py)')
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'tpu', 'slurm', 'mpi', 'env'],
                        help='multi-host bootstrap (jax.distributed); '
                             "'none' = single host driving all local chips")
    from s4former_tpu.config import DictAction
    parser.add_argument('--cfg-options', nargs='+', action=DictAction,
                        default={})
    return parser.parse_args()


def main():
    args = parse_args()

    # multi-host process group BEFORE any jax device use
    from s4former_tpu.parallel.distributed import init_distributed
    init_distributed(args.launcher)

    import jax
    import s4former_tpu.data  # noqa: F401
    import s4former_tpu.models  # noqa: F401
    from s4former_tpu.config import Config
    from s4former_tpu.core import checkpoint as ckpt_lib
    from s4former_tpu.core.runner import IterBasedRunner, make_eval_fn
    from s4former_tpu.data.datasets.custom import build_dataset
    from s4former_tpu.data.loader import SemiLoader
    from s4former_tpu.models import build_segmentor, init_segmentor_variables
    from s4former_tpu.parallel.mesh import make_mesh, replicate_state
    from s4former_tpu.semi.config import SemiConfig
    from s4former_tpu.semi.train_step import (create_train_state,
                                              make_semi_train_step)
    from s4former_tpu.utils.logger import get_root_logger

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    if args.diff_seed:
        args.seed = args.seed + jax.process_index()
    if args.deterministic:
        # XLA has no cuDNN-benchmark nondeterminism to disable; the flag
        # exists so reference launch scripts run unmodified
        pass

    work_dir = args.work_dir or osp.join(
        'work_dirs', osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(osp.join(work_dir, osp.basename(args.config)))
    logger = get_root_logger(osp.join(
        work_dir, time.strftime('%Y%m%d_%H%M%S') + '.log'))
    from s4former_tpu.utils.collect_env import collect_env
    dash = '-' * 60
    env_info = '\n'.join(f'{k}: {v}' for k, v in collect_env().items())
    logger.info('Environment info:\n' + dash + '\n' + env_info + '\n' + dash)
    logger.info(f'devices: {jax.devices()}')

    model = build_segmentor(cfg.model)
    semi_cfg = SemiConfig.from_model_cfg(cfg.model)
    crop = tuple(cfg.get('crop_size', (512, 512)))
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(args.seed), (1, crop[0], crop[1], 3))

    # pretrained ingestion (OpenMMLab DeiT .pth — README.md:16-24)
    init_ckpt = args.load_from
    bb = cfg.model.get('backbone', {})
    if init_ckpt is None and isinstance(bb.get('init_cfg'), dict):
        init_ckpt = bb['init_cfg'].get('checkpoint')
    if init_ckpt and init_ckpt.endswith(('.pth', '.pt')):
        if osp.isfile(init_ckpt):
            grid = (crop[0] // bb.get('patch_size', 16),
                    crop[1] // bb.get('patch_size', 16))
            pre = ckpt_lib.convert_mmseg_checkpoint(
                init_ckpt, num_layers=bb.get('num_layers', 12),
                dst_grid=grid)
            variables = ckpt_lib.merge_pretrained(variables, pre)
            logger.info(f'loaded pretrained {init_ckpt}')
        else:
            logger.warning(f'pretrained {init_ckpt} not found; '
                           'training from scratch')

    state = create_train_state(variables, ema=semi_cfg.ema)
    mesh = make_mesh(model_parallel=args.model_parallel)
    if args.model_parallel > 1 or args.zero3:
        from s4former_tpu.parallel.tp import shard_train_state
        state = shard_train_state(mesh, state, zero3=args.zero3)
        logger.info(f'sharded state: model axis = {args.model_parallel} '
                    f'(Megatron), zero3 = {args.zero3}')
    else:
        state = replicate_state(mesh, state)

    # data
    train_cfg = cfg.data['train']
    sup_ds = build_dataset(train_cfg['sup']) if 'sup' in train_cfg else \
        build_dataset(train_cfg)
    unsup_ds = None
    unsup_mix_ds = None
    if semi_cfg.ema and train_cfg.get('unsup'):
        unsup_ds = build_dataset(train_cfg['unsup'])
        # UniSemiDataset third source (UniMatch mix streams)
        mix_cfg = train_cfg.get('unsup_mix') or train_cfg.get('unsup2')
        if mix_cfg:
            unsup_mix_ds = build_dataset(mix_cfg)
    n_chips = len(jax.devices())
    sup_pb = cfg.get('samples_per_gpu_sup',
                     cfg.data.get('samples_per_gpu', 8) // 2
                     if unsup_ds is not None
                     else cfg.data.get('samples_per_gpu', 8))
    unsup_pb = cfg.get('samples_per_gpu_unsup', sup_pb) \
        if unsup_ds is not None else 0
    loader = SemiLoader(sup_ds, unsup_ds, unsup_mix_ds,
                        sup_per_batch=sup_pb * n_chips,
                        unsup_per_batch=unsup_pb * n_chips,
                        num_workers=cfg.data.get('workers_per_gpu', 4) * 2,
                        seed=args.seed)
    logger.info(f'sup dataset: {len(sup_ds)} imgs' +
                (f', unsup: {len(unsup_ds)} imgs' if unsup_ds else ''))

    # train step from config
    opt = cfg.get('optimizer', {})
    lr_cfg = cfg.get('lr_config', {})
    runner_cfg = cfg.get('runner', {})
    pw_cfg = opt.get('paramwise_cfg', {}) or {}
    paramwise = pw_cfg.get('custom_keys', {})
    custom_keys = {k: v.get('lr_mult', 1.0) for k, v in paramwise.items()}
    # layer-wise LR decay (LearningRateDecayOptimizerConstructor config
    # shape: paramwise_cfg=dict(num_layers=N, decay_rate=r))
    layer_decay = None
    if 'num_layers' in pw_cfg and 'decay_rate' in pw_cfg:
        layer_decay = dict(num_layers=pw_cfg['num_layers'],
                           decay_rate=pw_cfg['decay_rate'],
                           decay_type=pw_cfg.get('decay_type',
                                                 'layer_wise'))
    max_iters = args.max_iters or runner_cfg.get('max_iters', 80001)
    grad_clip = (cfg.get('optimizer_config', {}) or {}).get('grad_clip')
    step_fn = make_semi_train_step(
        model, semi_cfg, num_classes=model.num_classes,
        base_lr=opt.get('lr', 0.01), max_iters=max_iters,
        power=lr_cfg.get('power', 0.9), min_lr=lr_cfg.get('min_lr', 1e-4),
        sgd_momentum=opt.get('momentum', 0.9),
        weight_decay=opt.get('weight_decay', 0.0),
        custom_keys=custom_keys or None,
        grad_clip_norm=grad_clip.get('max_norm') if grad_clip else None,
        paramwise_cfg=layer_decay)

    eval_fn = None
    if not args.no_validate and 'val' in cfg.data:
        try:
            val_ds = build_dataset(cfg.data['val'])
            test_mode = (cfg.model.get('test_cfg') or {}).get('mode', 'whole')
            eval_fn = make_eval_fn(model, val_ds, mode=test_mode,
                                   crop_size=crop)
        except FileNotFoundError as e:
            logger.warning(f'val dataset unavailable ({e}); skipping eval')

    evaluation = cfg.get('evaluation', {})
    checkpoint_config = cfg.get('checkpoint_config', {})
    log_config = cfg.get('log_config', {})
    runner = IterBasedRunner(
        step_fn, state, loader, max_iters=max_iters, work_dir=work_dir,
        mesh=mesh,
        log_interval=log_config.get('interval', 50),
        checkpoint_interval=checkpoint_config.get('interval', 5750),
        eval_interval=evaluation.get('interval', 1150),
        eval_fn=eval_fn, seed=args.seed, logger=logger)
    runner.resume(args.resume_from, auto=args.auto_resume)
    runner.run()


if __name__ == '__main__':
    main()
