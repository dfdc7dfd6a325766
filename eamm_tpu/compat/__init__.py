from eamm_tpu.compat.torch_convert import (
    convert_kp_detector, convert_kp_detector_a, convert_generator,
    convert_atnet, convert_tfnet, convert_emotion_k, convert_emotion_map,
    convert_stylegan2, convert_discriminator, load_torch_checkpoint,
    convert_ct_encoder, convert_emotion_net, convert_af2f, convert_af2f_s,
    convert_a2i, convert_na_net, convert_audio_feature, convert_em_detector,
)
