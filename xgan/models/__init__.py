from xgan.models import cgan, dcgan, resnet, vgg, wgan
from xgan.models.resnet import ResNet50

__all__ = ["dcgan", "cgan", "wgan", "resnet", "vgg", "ResNet50"]
