from .resize import resize_bicubic, resize_bilinear  # noqa: F401
