from eamm_tpu.train.losses import (image_pyramid, perceptual_loss,
                                   kp_mimic_loss, emotion_residual_loss,
                                   lsgan_generator_loss, lsgan_discriminator_loss,
                                   feature_matching_loss)
from eamm_tpu.train.optim import make_optimizer, multistep_schedule
from eamm_tpu.train.steps import (Part1State, make_part1_step, init_part1_state,
                                  Part2State, make_part2_step, init_part2_state,
                                  Part1GanState, make_part1_gan_step,
                                  init_part1_gan_state,
                                  make_discriminator_step, equivariance_losses)
