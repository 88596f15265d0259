"""Config-validation parity with the reference's pydantic validators
(`/root/reference/packages/pprl_model/pprl_model/mask.py:126-267`,
`transform.py:29-95`), mirroring
`pprl_model/tests/test_custom_validation.py` message-for-message."""

import pytest

from pprl_ray.config import (
    AttributeConfig,
    AttributeSalt,
    CLKFilter,
    CLKRBFFilter,
    HashConfig,
    HashFunctionConfig,
    MaskConfig,
    RBFFilter,
    TransformConfig,
    validate_hardener_config,
    validate_mask_columns,
    validate_transformer_config,
)


def _mask_config(filt, attributes=()):
    return MaskConfig(
        token_size=2,
        hash=HashConfig(HashFunctionConfig(("sha1",), key="foobar"), "double_hash"),
        filter=filt,
        attributes=attributes,
    )


def test_attribute_salt_mutually_exclusive():
    with pytest.raises(ValueError, match="value and attribute cannot be set at the same time"):
        AttributeSalt(value="foobar", attribute="foobar")


def test_attribute_salt_none_set():
    with pytest.raises(ValueError, match="neither value nor attribute is set"):
        AttributeSalt()


@pytest.mark.parametrize("filt", [RBFFilter(hash_values=5, seed=727), CLKRBFFilter(hash_values=5)])
def test_static_attribute_with_weighted_filter(filt):
    with pytest.raises(
        ValueError,
        match=rf"`{filt.type}` filters require weighted attribute configurations, "
        rf"but static ones were found",
    ):
        _mask_config(filt, (AttributeConfig("foo", salt=AttributeSalt(value="foobar")),))


@pytest.mark.parametrize("filt", [RBFFilter(hash_values=5, seed=727), CLKRBFFilter(hash_values=5)])
def test_no_attributes_with_weighted_filter(filt):
    with pytest.raises(
        ValueError,
        match=rf"`{filt.type}` filters require weighted attribute configurations, "
        rf"but none were found",
    ):
        _mask_config(filt)


def test_weighted_attribute_with_static_filter():
    with pytest.raises(
        ValueError,
        match=r"`clk` filters require static attribute configurations, "
        r"but weighted ones were found",
    ):
        _mask_config(
            CLKFilter(filter_size=128, hash_values=5),
            (AttributeConfig("foo", salt=AttributeSalt(value="foobar"), weight=1, average_token_count=8),),
        )


def test_attribute_not_present_on_entities():
    cfg = _mask_config(
        CLKFilter(filter_size=128, hash_values=5),
        (AttributeConfig("###", salt=AttributeSalt(value="foobar")),),
    )
    with pytest.raises(
        ValueError, match=r"some configured attributes are not present on entities: `###`"
    ):
        validate_mask_columns(cfg, ["id", "foo"])


def test_attribute_salt_not_present_on_entities():
    cfg = _mask_config(
        CLKFilter(filter_size=128, hash_values=5),
        (AttributeConfig("foo", salt=AttributeSalt(attribute="###")),),
    )
    with pytest.raises(
        ValueError,
        match=r"some configured attribute salts are not present on entities: `###`",
    ):
        validate_mask_columns(cfg, ["id", "foo"])


def test_field_constraints():
    with pytest.raises(ValueError, match="token_size must be greater than 1"):
        MaskConfig(token_size=1, hash=HashConfig(), filter=CLKFilter(128, 5))
    with pytest.raises(ValueError, match="filter_size must be greater than 0"):
        CLKFilter(filter_size=0, hash_values=5)
    with pytest.raises(ValueError, match="hash_values must be greater than 0"):
        RBFFilter(hash_values=0, seed=1)
    with pytest.raises(ValueError, match="at least 1 entry"):
        HashFunctionConfig(())
    with pytest.raises(ValueError, match="unknown hash algorithm `sha3`"):
        HashFunctionConfig(("sha3",))
    with pytest.raises(ValueError, match="unknown hash strategy `quadruple_hash`"):
        HashConfig(HashFunctionConfig(), "quadruple_hash")
    with pytest.raises(ValueError, match="weight must be greater than 0"):
        AttributeConfig("a", weight=0, average_token_count=5)
    with pytest.raises(ValueError, match="must be set together"):
        AttributeConfig("a", weight=2.0)
    with pytest.raises(ValueError, match="unknown empty_value handling `drop`"):
        TransformConfig(empty_value="drop")


def test_hardener_constraints():
    validate_hardener_config({"name": "balance"})
    validate_hardener_config({"name": "rehash", "window_size": 8, "window_step": 4, "samples": 2})
    with pytest.raises(ValueError, match="unknown hardener `fold5`"):
        validate_hardener_config({"name": "fold5"})
    with pytest.raises(ValueError, match="`permute` hardener requires a seed"):
        validate_hardener_config({"name": "permute"})
    with pytest.raises(ValueError, match="probability must be between 0 and 1"):
        validate_hardener_config({"name": "randomized_response", "seed": 1, "probability": 1.5})
    with pytest.raises(ValueError, match=r"window_size must be in \(0, 32\]"):
        validate_hardener_config({"name": "rehash", "window_size": 33, "window_step": 1, "samples": 1})
    # bad hardener configs are rejected at MaskConfig construction
    with pytest.raises(ValueError, match="unknown hardener"):
        MaskConfig(
            token_size=2,
            hash=HashConfig(),
            filter=CLKFilter(128, 5),
            hardeners=({"name": "nope"},),
        )


def test_transformer_constraints():
    validate_transformer_config({"name": "normalization"})
    with pytest.raises(ValueError, match="unknown transformer `upper`"):
        validate_transformer_config({"name": "upper"})
    with pytest.raises(ValueError, match="requires input_format and output_format"):
        validate_transformer_config({"name": "date_time", "input_format": "%Y"})
    with pytest.raises(ValueError, match="at least 1 entry"):
        validate_transformer_config({"name": "mapping", "mapping": {}})
    with pytest.raises(ValueError, match="greater than or equal to 0"):
        validate_transformer_config({"name": "number", "decimal_places": -1})
    with pytest.raises(ValueError, match="unknown phonetic algorithm `nysiis`"):
        validate_transformer_config({"name": "phonetic_code", "algorithm": "nysiis"})


def test_transform_entities_rejects_empty_chains(ray_session):
    import ray.data as rd

    from pprl_ray.stages.mask import transform_entities

    ds = rd.from_items([{"id": "1", "foo": "bar"}])
    with pytest.raises(
        ValueError, match="attribute and global transformers are empty: must contain at least one"
    ):
        transform_entities(ds)


def test_mask_entities_rejects_missing_columns(ray_session):
    import ray.data as rd

    from pprl_ray.stages.mask import mask_entities

    ds = rd.from_items([{"id": "1", "foo": "bar"}])
    cfg = _mask_config(
        CLKFilter(filter_size=128, hash_values=5),
        (AttributeConfig("missing_attr", salt=AttributeSalt(value="s")),),
    )
    with pytest.raises(ValueError, match="not present on entities: `missing_attr`"):
        mask_entities(ds, cfg)
