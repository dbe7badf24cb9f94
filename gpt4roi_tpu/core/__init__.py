from gpt4roi_tpu.core.config import Config, load_config
from gpt4roi_tpu.core.registry import Registry
