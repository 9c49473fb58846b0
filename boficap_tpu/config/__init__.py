from .config import Config, load_yaml_with_base
from .opts import default_config, parse_opt, merge_cli

__all__ = ["Config", "load_yaml_with_base", "default_config", "parse_opt", "merge_cli"]
