* Balanced 2x3 transportation problem (degenerate network LP),
* netlib-style fixed MPS. min cost; optimum 41: S1->D1 5, S1->D3 5,
* S2->D2 6, S2->D3 4.
NAME          TRANS23
ROWS
 N  COST
 E  S1
 E  S2
 E  D1
 E  D2
 E  D3
COLUMNS
    X11       COST      2.0        S1        1.0
    X11       D1        1.0
    X12       COST      4.0        S1        1.0
    X12       D2        1.0
    X13       COST      1.0        S1        1.0
    X13       D3        1.0
    X21       COST      6.0        S2        1.0
    X21       D1        1.0
    X22       COST      3.0        S2        1.0
    X22       D2        1.0
    X23       COST      2.0        S2        1.0
    X23       D3        1.0
RHS
    RHS       S1        10.0       S2        10.0
    RHS       D1        5.0        D2        6.0
    RHS       D3        9.0
ENDATA
