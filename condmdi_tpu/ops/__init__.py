from condmdi_tpu.ops.attention import mha, multihead_attention
