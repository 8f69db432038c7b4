

def test_prach_configuration_unpaired_and_validation():
    from srsran_project_23_5_tpu.ran import prach_config as pc
    import pytest
    # exact TDD rows (TS 38.211 Table 6.3.3.2-3)
    c = pc.prach_configuration(0, paired=False)
    assert (c.format, c.x, c.y, c.subframes) == ("0", 16, 1, (9,))
    c16 = pc.prach_configuration(16, paired=False)
    assert c16.starting_symbol == 7 and c16.subframes == (1, 6)
    c66 = pc.prach_configuration(66, paired=False)
    assert c66.format == "3" and c66.subframes == (1, 3, 5, 7, 9)
    # validation: descriptive errors, not KeyError/assert
    with pytest.raises(ValueError, match="outside 0..255"):
        pc.prach_configuration(256)
    with pytest.raises(ValueError, match="subset"):
        pc.prach_configuration(200, paired=False)
    with pytest.raises(ValueError, match="subset"):
        pc.prach_configuration(100, paired=True)
