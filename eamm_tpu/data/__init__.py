from eamm_tpu.data.augmentation import AllAugmentationTransform
from eamm_tpu.data.datasets import (AudioDataset, VoxDataset, MeadDataset,
                                    DatasetRepeater, TestsetRepeater,
                                    PairedDataset, DataLoader, EMOTIONS)
