* Free and minus-infinity bounded variables (FR / MI / PL), netlib-style.
* min x1 + 2 x2 - x3  s.t.  x1 + x2 + x3 = 4;  x2 - x3 >= -2
* x1 free, x2 >= -3 (MI then LO), x3 <= 5 via UP with PL noise.
NAME          FREEMI
ROWS
 N  OBJ
 E  R1
 G  R2
COLUMNS
    X1        OBJ       1.0        R1        1.0
    X2        OBJ       2.0        R1        1.0
    X2        R2        1.0
    X3        OBJ      -1.0        R1        1.0
    X3        R2       -1.0
RHS
    RHS       R1        4.0        R2       -2.0
BOUNDS
 FR BND       X1
 MI BND       X2
 LO BND       X2       -3.0
 UP BND       X3        5.0
 PL BND       X3
ENDATA
