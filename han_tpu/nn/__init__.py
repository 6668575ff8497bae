from han_tpu.nn.layers import GATConv, ConstAttention, SemanticAttention  # noqa: F401
from han_tpu.nn.models import GAT, HAN, HANShared  # noqa: F401
from han_tpu.nn import losses  # noqa: F401
