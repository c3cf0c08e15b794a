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
    "inceptionv4",
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
    "yolov10",
    "centernet",
    "hrnet_ocr",
    "convnextv2",
    "swin",
    "yolov8",
    "yolop",
    "ppocr_lcnet",
    "ppocr_hgnet",
    "ppocr_uvdoc",
    "ppocr_slanet",
    "ppocr_slanext",
    "ppocr_rtdetr",
    "ppocr_formula",
]

_loaded = False


def load_all():
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(f"tensorrtx_tpu.models.{mod}")
        except ModuleNotFoundError as e:
            # Tolerate only a genuinely absent model module; a typo'd import
            # inside an existing module must surface, not vanish.
            if e.name != f"tensorrtx_tpu.models.{mod}":
                raise
    _loaded = True
