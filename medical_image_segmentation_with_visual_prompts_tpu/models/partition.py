"""Path-based parameter partitioning (the ``named_parameters_*`` scheme).

The reference's central freezing/checkpointing mechanism is a family of
``named_parameters_{encoder,decoder,downstream,prompt_tokens_*}``
accessors (/root/reference/src/modules/swin_unetr/swin_unetr.py:433-527
and the ``named_parameters_body`` / ``..._bias_content`` /
``..._bias_prompt_tokens`` helpers in swin_block.py:272-289,
relative_positional_encoding.py:144-154).  In JAX, parameters are a
pytree, so the same mechanism is a pure function from parameter *path*
to a partition label, plus set algebra over labels:

Labels
------
* ``encoder_body``          input layer + swin block bodies + merges
* ``encoder_bias_content``  encoder RelativePE content embeddings/weights
* ``encoder_prompt``        encoder prompt tokens + RelativePE token bias
* ``decoder_body``          bottleneck, skip residuals, up-block bodies
                            (+ output layer body when it has parameters)
* ``decoder_bias_content``  decoder RelativePE content params
* ``decoder_prompt``        decoder prompt tokens (incl. output-layer
                            tokens) + decoder RelativePE token bias
* ``head_ssl``              reconstruction / rotation / contrastive heads
* ``head_segmentation``     supervised-pretrain seg head
* ``head_downstream``       downstream seg head

Group builders mirror the reference's accessors exactly, including the
edge cases: encoder prompt tokens are *frozen* in decoder-only modes when
encoder prompting is active (swin_unetr.py:25-29), and downstream
training touches only prompts + downstream head (:433-441).
"""

from __future__ import annotations

from typing import Callable, Dict, Set

from flax import traverse_util

_ENCODER_PREFIXES = ("input_layer", "encoder_blocks")
_DECODER_PREFIXES = ("bottleneck", "residual_blocks", "decoder_blocks",
                     "output_layer")
_PE_CONTENT = ("enc_content_h", "enc_content_w", "enc_content_d",
               "weights_content_h", "weights_content_w", "weights_content_d")
_PE_TOKEN = ("enc_token", "weights_token")


def label_of(path) -> str:
    """Partition label for one parameter path (tuple of str keys)."""
    head = path[0]
    if head.startswith("prompt_tokens_enc"):
        return "encoder_prompt"
    if head.startswith("prompt_tokens_dec") or head.startswith("prompt_tokens_out"):
        return "decoder_prompt"
    if head.startswith("head_"):
        if head == "head_downstream":
            return "head_downstream"
        if head == "head_segmentation":
            return "head_segmentation"
        return "head_ssl"
    side = None
    if any(head.startswith(p) for p in _ENCODER_PREFIXES):
        side = "encoder"
    elif any(head.startswith(p) for p in _DECODER_PREFIXES):
        side = "decoder"
    else:
        raise ValueError(f"Unrecognized parameter path: {'/'.join(path)}")
    if "pe" in path:
        name = path[-2] if path[-1] in ("kernel", "bias") else path[-1]
        if name in _PE_CONTENT:
            return f"{side}_bias_content"
        if name in _PE_TOKEN:
            return f"{side}_prompt"
        raise ValueError(f"Unrecognized PE parameter: {'/'.join(path)}")
    return f"{side}_body"


def param_labels(params: Dict) -> Dict:
    """Same nesting as ``params`` with a label string at each leaf."""
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict(
        {k: label_of(k) for k in flat})


# -------------------------------------------------------- group builders

def downstream_labels(conf) -> Set[str]:
    """named_parameters_downstream (ref swin_unetr.py:433-441)."""
    labels = {"head_downstream"}
    if conf.use_encoder_prompting:
        labels.add("encoder_prompt")
    if conf.use_decoder_prompting:
        labels.add("decoder_prompt")
    return labels


def encoder_labels(conf, include_prompt_tokens: bool = False) -> Set[str]:
    """named_parameters_encoder (ref :477-494)."""
    labels = {"encoder_body", "encoder_bias_content"}
    if include_prompt_tokens and conf.use_encoder_prompting:
        labels.add("encoder_prompt")
    if conf.training_mode == "self_supervised_learning_encoder":
        labels.add("head_ssl")
    return labels


def decoder_labels(conf, include_prompt_tokens: bool = False) -> Set[str]:
    """named_parameters_decoder (ref :497-527)."""
    labels = {"decoder_body", "decoder_bias_content"}
    if include_prompt_tokens and conf.use_decoder_prompting:
        labels.add("decoder_prompt")
    if conf.training_mode in ("supervised_learning_decoder",
                              "supervised_learning_all"):
        labels.add("head_segmentation")
    return labels


def trainable_labels(conf) -> Set[str]:
    """Labels that receive gradient updates in each training mode.

    Mirrors the requires_grad logic in the reference constructor
    (swin_unetr.py:21-44) combined with each trainer's optimizer
    param-group selection.
    """
    mode = conf.training_mode
    if mode == "self_supervised_learning_encoder":
        # multi_view.py:57-71: encoder body (+heads) and, when active,
        # encoder prompt tokens.
        labels = encoder_labels(conf)
        if conf.use_encoder_prompting:
            labels.add("encoder_prompt")
        return labels
    if mode in ("self_supervised_learning_decoder", "supervised_learning_decoder"):
        # Encoder frozen (incl. its prompt tokens when prompting is on,
        # swin_unetr.py:25-29); students_teacher.py:42-61.
        labels = decoder_labels(conf)
        if conf.use_decoder_prompting:
            labels.add("decoder_prompt")
        return labels
    if mode in ("self_supervised_learning_all", "supervised_learning_all"):
        # students_teacher.py:25-41: everything, with prompt tokens in
        # their own groups.
        labels = encoder_labels(conf) | decoder_labels(conf)
        if conf.use_encoder_prompting:
            labels.add("encoder_prompt")
        if conf.use_decoder_prompting:
            labels.add("decoder_prompt")
        return labels
    if mode == "downstream":
        return downstream_labels(conf)
    raise ValueError(f"Training mode {mode} not available!")


def split_params(params: Dict, labels: Set[str]):
    """Split a params tree into (selected, rest) by label membership."""
    flat = traverse_util.flatten_dict(params)
    sel = {k: v for k, v in flat.items() if label_of(k) in labels}
    rest = {k: v for k, v in flat.items() if label_of(k) not in labels}
    return (traverse_util.unflatten_dict(sel),
            traverse_util.unflatten_dict(rest))


def merge_params(a: Dict, b: Dict) -> Dict:
    """Inverse of :func:`split_params`."""
    flat = dict(traverse_util.flatten_dict(a))
    flat.update(traverse_util.flatten_dict(b))
    return traverse_util.unflatten_dict(flat)


def label_mask(params: Dict, predicate: Callable[[str], bool]) -> Dict:
    """Boolean mask tree for optax.masked / multi_transform."""
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict(
        {k: predicate(label_of(k)) for k in flat})
