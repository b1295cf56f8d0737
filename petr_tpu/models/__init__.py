from petr_tpu.models.detector import PETRDetector
from petr_tpu.models.petr_head import PETRHead
from petr_tpu.models.petrv2_head import PETRv2Head
from petr_tpu.models.resnet import ResNet
from petr_tpu.models.vovnet import VoVNet
from petr_tpu.models.fpn import CPFPN
from petr_tpu.models.transformer import PETRTransformer, PETRTransformerDecoder
from petr_tpu.models.grid_mask import grid_mask
