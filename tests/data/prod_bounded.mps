* Production planning with variable bounds (netlib-style fixed MPS).
* minimize cost s.t. capacity (L), contract minimum (G), balance (E),
* UP/LO/FX bounds on structural variables.
NAME          PRODBND
ROWS
 N  COST
 L  CAP1
 L  CAP2
 G  MIN1
 E  BAL
COLUMNS
    P1        COST      4.0        CAP1      2.0
    P1        CAP2      1.0        MIN1      1.0
    P1        BAL       1.0
    P2        COST      3.0        CAP1      1.0
    P2        CAP2      3.0        MIN1      1.0
    P3        COST      5.0        CAP1      1.0
    P3        CAP2      1.0        BAL      -1.0
    P4        COST      1.5        CAP2      2.0
    P4        BAL       1.0
RHS
    RHS       CAP1      20.0       CAP2      24.0
    RHS       MIN1      3.0        BAL       2.0
BOUNDS
 UP BND       P1        6.0
 LO BND       P2        1.0
 UP BND       P2        8.0
 FX BND       P4        2.5
ENDATA
