from .embeddings import fourier_embed, fourier_out_dim, get_timestep_embedding
from .attention import dot_product_attention
