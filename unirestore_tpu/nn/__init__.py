from . import attention, embeddings, init, layers, resnet, transformer  # noqa: F401
