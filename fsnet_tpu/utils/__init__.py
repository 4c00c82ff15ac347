from .easydict import EasyDict, edict
from .config import (cfg_from_file, get_num_parameters, set_random_seed,
                     update_cfg, update_dict)
from .builder import build, find_object, merge_name, Sequential, Parallel, Shuffle
from .keys import encode_key, decode_key, encode_batch, decode_batch
from .timer import Timer, profile, formatting_time
from .logger import AverageMeter, LossLogger, styling_git_info

__all__ = [
    "EasyDict", "edict",
    "cfg_from_file", "update_cfg", "update_dict", "set_random_seed",
    "get_num_parameters",
    "build", "find_object", "merge_name", "Sequential", "Parallel", "Shuffle",
    "encode_key", "decode_key", "encode_batch", "decode_batch",
    "Timer", "profile", "formatting_time",
    "AverageMeter", "LossLogger", "styling_git_info",
]
