from .unet import UNetConfig, UNet2DConditionModel
from .controlnet import BEVControlNetConfig, BEVControlNet
from .vae import AutoencoderKL, VAEConfig
from .clip_text import CLIPTextConfig, CLIPTextModel
