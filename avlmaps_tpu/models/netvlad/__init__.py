from avlmaps_tpu.models.netvlad.model import (  # noqa: F401
    NetVLAD, NetVLADConfig, NetVLADEncoder, VGGBackbone,
)
from avlmaps_tpu.models.netvlad.port import (  # noqa: F401
    load_netvlad_encoder, load_netvlad_mat,
)
