from sv3d_tpu.models.ifnet import IFNet
from sv3d_tpu.models.projection import Projection
from sv3d_tpu.models.scene_net import SceneNet
from sv3d_tpu.models.unet import UNet, UNetMini

__all__ = ["UNet", "UNetMini", "IFNet", "Projection", "SceneNet"]
