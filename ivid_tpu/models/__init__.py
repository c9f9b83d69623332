from ivid_tpu.models.adm import AdmUnet2d, build_adm_unet

BACKBONES = {"AdmUnet2d": build_adm_unet}

__all__ = ["AdmUnet2d", "build_adm_unet", "BACKBONES"]
