"""CLI entry: fit/test dispatch over the trainer registry.

Parity with /root/reference/src/main.py:6-44 — same flags, same
``--mode fit|test`` dispatch, same ``--training-mode`` switch; extra
configs live in the YAML file (configurations/example_configs.yml).

Run as ``python -m medical_image_segmentation_with_visual_prompts_tpu.main``.
"""

from __future__ import annotations

from argparse import ArgumentParser, Namespace

from .utils import get_full_configs
from .utils.initialization import setup_fitting, setup_testing


def main(mode: str, hparams: Namespace):
    # Honor JAX_PLATFORMS (platform plugins override the env var unless
    # re-asserted through jax.config) and enable the compile cache;
    # must run before first backend use.
    from .utils.backend import configure_backend
    configure_backend()
    # Multi-host controller handshake (no-op unless `distributed: true`);
    # must run before first backend use so jax.devices() is global.
    from .parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed(hparams)
    if mode == "fit":
        trainer = setup_fitting(hparams)
        trainer.train()
    elif mode == "test":
        trainer = setup_testing(hparams)
        trainer.test()
    else:
        raise ValueError("The mode is not available.")


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    parser.add_argument("--mode", default="fit", type=str)
    parser.add_argument("--training-mode",
                        default="self_supervised_learning_all", type=str)
    parser.add_argument("--configs", default="example_configs.yml", type=str)

    parser.add_argument("--load-ckpt-backbone", action="store_true",
                        default=False)
    parser.add_argument("--load-ckpt-backbone-path", default="", type=str)
    parser.add_argument("--save-ckpt-backbone", action="store_true",
                        default=False)
    parser.add_argument("--save-ckpt-backbone-path", default="", type=str)

    parser.add_argument("--load-ckpt-prompt-tokens", action="store_true",
                        default=False)
    parser.add_argument("--load-ckpt-prompt-tokens-path", default="",
                        type=str)
    parser.add_argument("--save-ckpt-prompt-tokens", action="store_true",
                        default=False)
    parser.add_argument("--save-ckpt-prompt-tokens-path", default="",
                        type=str)

    parser.add_argument("--use-encoder-prompting", action="store_true",
                        default=False)
    parser.add_argument("--use-decoder-prompting", action="store_true",
                        default=False)

    parser.add_argument("--backbone", default="swin_unetr", type=str)
    parser.add_argument("--run-name", default="", type=str)
    # Extra configs are set in the configuration file!
    return parser


def cli():
    """Console entry point (``mivp-train``)."""
    args = build_parser().parse_args()
    configs = get_full_configs(args)
    main(args.mode, configs)


if __name__ == "__main__":
    cli()
