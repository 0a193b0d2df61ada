"""Job parameter resolution: CLI > JSON config file > environment.

Reproduces the reference ETL jobs' precedence chain
(artifacts/spark_programs/spark_submit_tb_call_req_parquet.py:44-68:
click CLI options override a JSON config file, which overrides env
vars), without the click dependency.
"""

from __future__ import annotations

import json
import os
from typing import Any


def resolve_params(
    cli: dict[str, Any] | None = None,
    config_file: str | None = None,
    env_prefix: str = "DTS_",
    defaults: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Merge parameters with precedence CLI > JSON file > env > defaults.

    ``None``-valued CLI entries are treated as "not given" (the reference
    treats absent click options the same way).
    """
    params: dict[str, Any] = dict(defaults or {})
    for key, value in os.environ.items():
        if key.startswith(env_prefix):
            params[key[len(env_prefix):].lower()] = value
    if config_file and os.path.exists(config_file):
        with open(config_file) as fh:
            file_params = json.load(fh)
        if not isinstance(file_params, dict):
            raise ValueError(f"config file {config_file} must hold a JSON object")
        params.update(file_params)
    for key, value in (cli or {}).items():
        if value is not None:
            params[key] = value
    return params
