from gpt4roi_tpu.models.clip_vit import ClipVisionConfig, clip_vision_forward, init_clip_params
from gpt4roi_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward
from gpt4roi_tpu.models.spi import SpiConfig, init_spi_params, spi_forward
