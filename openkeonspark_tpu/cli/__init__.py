from openkeonspark_tpu.cli.args import build_parser, config_from_args  # noqa: F401
