from pprx.bench.run import run_config, CONFIGS

__all__ = ["run_config", "CONFIGS"]
