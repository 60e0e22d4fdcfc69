from .metrics import psnr, ssim
from .losses import gaussian_nll, gaussian_nll_masked, mse_loss
