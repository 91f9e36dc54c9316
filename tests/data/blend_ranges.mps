* Blending with RANGES (two-sided rows) and an objective constant
* (RHS entry on the N row). netlib-style fixed MPS.
NAME          BLENDRNG
ROWS
 N  PROFIT
 L  MIX1
 G  MIX2
 E  TOTAL
COLUMNS
    ING1      PROFIT    2.0        MIX1      1.0
    ING1      MIX2      0.5        TOTAL     1.0
    ING2      PROFIT    3.0        MIX1      2.0
    ING2      MIX2      1.0        TOTAL     1.0
    ING3      PROFIT    1.0        MIX1      0.5
    ING3      TOTAL     1.0
RHS
    RHS       MIX1      10.0       MIX2      2.0
    RHS       TOTAL     8.0        PROFIT    -5.0
RANGES
    RNG       MIX1      4.0        TOTAL     2.0
OBJSENSE
    MAX
ENDATA
