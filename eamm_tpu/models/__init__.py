from eamm_tpu.models.blocks import (BatchNorm, ConvBlock, SameBlock, DownBlock,
                                    UpBlock, ResBlock, Encoder, Decoder, Hourglass)
from eamm_tpu.models.kp_detector import KPDetector, KPDetectorA
from eamm_tpu.models.dense_motion import DenseMotionNetwork
from eamm_tpu.models.generator import OcclusionAwareGenerator
from eamm_tpu.models.discriminator import Discriminator, MultiScaleDiscriminator
from eamm_tpu.models.audio import ATNet
from eamm_tpu.models.emotion import EmotionK, EmotionMap
