from c2m_tpu.losses.losses import (
    gan_mse_loss,
    feature_matching_loss,
    kl_loss,
    l1_masked,
    masked_theta_losses,
    perceptual_loss,
    smooth_loss,
    flow_consistency_loss,
    ssim_loss,
    training_losses,
)
