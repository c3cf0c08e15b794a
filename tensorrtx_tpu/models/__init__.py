"""Model catalog. Each module registers one or more ModelDefs on import."""

import importlib

# Modules that register models on import. Extend as the catalog grows.
_MODULES = [
    "lenet",
    "mlp",
    "alexnet",
    "vgg",
    "resnet",
    "googlenet",
    "squeezenet",
    "mobilenet",
    "mobilenetv3",
    "shufflenetv2",
    "mnasnet",
    "senet",
    "repvgg",
    "densenet",
    "inception",
    "ghostnet",
    "ibnnet",
    "hrnet",
    "hrnet_seg",
    "efficientnet",
    "arcface",
    "retinaface",
    "retinaface_anticov",
    "refinedet",
    "crnn",
    "lprnet",
    "dbnet",
    "ppocr_det",
    "ppocr_rec",
    "psenet",
    "real_esrgan",
    "superpoint",
    "efficient_ad",
    "tsm",
    "csrnet",
    "ufld",
    "unet",
    "vit",
    "detr",
    "rcnn",
    "yolo11",
    "yolov3",
    "yolov4",
    "scaled_yolov4",
    "yolov5",
    "yolov5_lite",
    "yolov7",
    "yolov9",
    "yolov12",
    "yolov13",
    "yolo26",
    "swin",
    "yolov8",
    "yolop",
]

_loaded = False


def load_all():
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(f"tensorrtx_tpu.models.{mod}")
        except ImportError:
            pass  # model not implemented yet
    _loaded = True
