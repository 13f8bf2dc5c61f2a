"""Alias package: ``dynamicppr_tpu`` re-exports the ``pprx`` framework.

The build plan's canonical package name is ``pprx`` (SURVEY.md §7); this
alias keeps the ``dynamicppr_tpu`` import path working, with the generic
subpackage names mapped onto the real modules:

- ``dynamicppr_tpu.models``   -> the PPR engines (push/sparse/update)
- ``dynamicppr_tpu.ops``      -> kernels and frontier ops
- ``dynamicppr_tpu.parallel`` -> mesh + sharded execution
- ``dynamicppr_tpu.utils``    -> io, config, eval, logging
"""

import pprx
from pprx import PprConfig, StreamConfig, MeshConfig

from dynamicppr_tpu import models, ops, parallel, utils

__version__ = pprx.__version__

__all__ = [
    "PprConfig",
    "StreamConfig",
    "MeshConfig",
    "models",
    "ops",
    "parallel",
    "utils",
    "__version__",
]
