from .config import Config, load_yaml_with_base
from .opts import default_config, finalize, merge_cli, parse_opt

__all__ = ["Config", "load_yaml_with_base", "default_config", "finalize",
           "parse_opt", "merge_cli"]
