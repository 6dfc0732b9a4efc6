from etl_school_spark.multimodal.media import (
    attach_media,
    audio_features,
    decode_image_real,
    frame_sample,
    image_features,
    resize_images,
)

__all__ = [
    "attach_media",
    "audio_features",
    "decode_image_real",
    "frame_sample",
    "image_features",
    "resize_images",
]
