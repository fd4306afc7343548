from .attention import fused_attention, fused_attention_qkv

__all__ = ["fused_attention", "fused_attention_qkv"]
