from eamm_tpu.compat.torch_convert import (
    convert_kp_detector, convert_kp_detector_a, convert_generator,
    convert_atnet, convert_emotion_k, convert_emotion_map,
    convert_stylegan2, convert_discriminator, load_torch_checkpoint,
)
