-- SQL Sync Script - Full CRUD Support
-- Generated to sync backup database with production
-- Generated on: 2026-08-12 05:14:36

-- WARNING: This script contains DELETE operations!
-- Please review carefully before execution.
-- Consider backing up your backup database before running this script.

-- DELETE Records
-- ===============
-- Records that exist in backup but not in production

-- Deleting 7 records from customer
DELETE FROM `customer` WHERE `c_custkey` = 150;
DELETE FROM `customer` WHERE `c_custkey` = 151;
DELETE FROM `customer` WHERE `c_custkey` = 152;
DELETE FROM `customer` WHERE `c_custkey` = 153;
DELETE FROM `customer` WHERE `c_custkey` = 154;
DELETE FROM `customer` WHERE `c_custkey` = 155;
DELETE FROM `customer` WHERE `c_custkey` = 156;

-- Deleting 75 records from orders
DELETE FROM `orders` WHERE `o_orderkey` = 1500;
DELETE FROM `orders` WHERE `o_orderkey` = 1501;
DELETE FROM `orders` WHERE `o_orderkey` = 1502;
DELETE FROM `orders` WHERE `o_orderkey` = 1503;
DELETE FROM `orders` WHERE `o_orderkey` = 1504;
DELETE FROM `orders` WHERE `o_orderkey` = 1505;
DELETE FROM `orders` WHERE `o_orderkey` = 1506;
DELETE FROM `orders` WHERE `o_orderkey` = 1507;
DELETE FROM `orders` WHERE `o_orderkey` = 1508;
DELETE FROM `orders` WHERE `o_orderkey` = 1509;
DELETE FROM `orders` WHERE `o_orderkey` = 1510;
DELETE FROM `orders` WHERE `o_orderkey` = 1511;
DELETE FROM `orders` WHERE `o_orderkey` = 1512;
DELETE FROM `orders` WHERE `o_orderkey` = 1513;
DELETE FROM `orders` WHERE `o_orderkey` = 1514;
DELETE FROM `orders` WHERE `o_orderkey` = 1515;
DELETE FROM `orders` WHERE `o_orderkey` = 1516;
DELETE FROM `orders` WHERE `o_orderkey` = 1517;
DELETE FROM `orders` WHERE `o_orderkey` = 1518;
DELETE FROM `orders` WHERE `o_orderkey` = 1519;
DELETE FROM `orders` WHERE `o_orderkey` = 1520;
DELETE FROM `orders` WHERE `o_orderkey` = 1521;
DELETE FROM `orders` WHERE `o_orderkey` = 1522;
DELETE FROM `orders` WHERE `o_orderkey` = 1523;
DELETE FROM `orders` WHERE `o_orderkey` = 1524;
DELETE FROM `orders` WHERE `o_orderkey` = 1525;
DELETE FROM `orders` WHERE `o_orderkey` = 1526;
DELETE FROM `orders` WHERE `o_orderkey` = 1527;
DELETE FROM `orders` WHERE `o_orderkey` = 1528;
DELETE FROM `orders` WHERE `o_orderkey` = 1529;
DELETE FROM `orders` WHERE `o_orderkey` = 1530;
DELETE FROM `orders` WHERE `o_orderkey` = 1531;
DELETE FROM `orders` WHERE `o_orderkey` = 1532;
DELETE FROM `orders` WHERE `o_orderkey` = 1533;
DELETE FROM `orders` WHERE `o_orderkey` = 1534;
DELETE FROM `orders` WHERE `o_orderkey` = 1535;
DELETE FROM `orders` WHERE `o_orderkey` = 1536;
DELETE FROM `orders` WHERE `o_orderkey` = 1537;
DELETE FROM `orders` WHERE `o_orderkey` = 1538;
DELETE FROM `orders` WHERE `o_orderkey` = 1539;
DELETE FROM `orders` WHERE `o_orderkey` = 1540;
DELETE FROM `orders` WHERE `o_orderkey` = 1541;
DELETE FROM `orders` WHERE `o_orderkey` = 1542;
DELETE FROM `orders` WHERE `o_orderkey` = 1543;
DELETE FROM `orders` WHERE `o_orderkey` = 1544;
DELETE FROM `orders` WHERE `o_orderkey` = 1545;
DELETE FROM `orders` WHERE `o_orderkey` = 1546;
DELETE FROM `orders` WHERE `o_orderkey` = 1547;
DELETE FROM `orders` WHERE `o_orderkey` = 1548;
DELETE FROM `orders` WHERE `o_orderkey` = 1549;
DELETE FROM `orders` WHERE `o_orderkey` = 1550;
DELETE FROM `orders` WHERE `o_orderkey` = 1551;
DELETE FROM `orders` WHERE `o_orderkey` = 1552;
DELETE FROM `orders` WHERE `o_orderkey` = 1553;
DELETE FROM `orders` WHERE `o_orderkey` = 1554;
DELETE FROM `orders` WHERE `o_orderkey` = 1555;
DELETE FROM `orders` WHERE `o_orderkey` = 1556;
DELETE FROM `orders` WHERE `o_orderkey` = 1557;
DELETE FROM `orders` WHERE `o_orderkey` = 1558;
DELETE FROM `orders` WHERE `o_orderkey` = 1559;
DELETE FROM `orders` WHERE `o_orderkey` = 1560;
DELETE FROM `orders` WHERE `o_orderkey` = 1561;
DELETE FROM `orders` WHERE `o_orderkey` = 1562;
DELETE FROM `orders` WHERE `o_orderkey` = 1563;
DELETE FROM `orders` WHERE `o_orderkey` = 1564;
DELETE FROM `orders` WHERE `o_orderkey` = 1565;
DELETE FROM `orders` WHERE `o_orderkey` = 1566;
DELETE FROM `orders` WHERE `o_orderkey` = 1567;
DELETE FROM `orders` WHERE `o_orderkey` = 1568;
DELETE FROM `orders` WHERE `o_orderkey` = 1569;
DELETE FROM `orders` WHERE `o_orderkey` = 1570;
DELETE FROM `orders` WHERE `o_orderkey` = 1571;
DELETE FROM `orders` WHERE `o_orderkey` = 1572;
DELETE FROM `orders` WHERE `o_orderkey` = 1573;
DELETE FROM `orders` WHERE `o_orderkey` = 1574;

-- Deleting 300 records from lineitem
DELETE FROM `lineitem` WHERE `l_orderkey` = 1500;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1501;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1502;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1503;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1504;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1505;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1506;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1507;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1508;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1509;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1510;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1511;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1512;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1513;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1514;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1515;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1516;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1517;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1518;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1519;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1520;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1521;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1522;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1523;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1524;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1525;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1526;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1527;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1528;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1529;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1530;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1531;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1532;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1533;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1534;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1535;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1536;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1537;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1538;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1539;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1540;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1541;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1542;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1543;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1544;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1545;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1546;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1547;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1548;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1549;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1550;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1551;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1552;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1553;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1554;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1555;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1556;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1557;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1558;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1559;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1560;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1561;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1562;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1563;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1564;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1565;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1566;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1567;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1568;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1569;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1570;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1571;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1572;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1573;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1574;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1575;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1576;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1577;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1578;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1579;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1580;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1581;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1582;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1583;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1584;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1585;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1586;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1587;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1588;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1589;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1590;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1591;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1592;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1593;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1594;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1595;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1596;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1597;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1598;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1599;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1600;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1601;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1602;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1603;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1604;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1605;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1606;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1607;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1608;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1609;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1610;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1611;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1612;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1613;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1614;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1615;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1616;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1617;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1618;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1619;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1620;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1621;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1622;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1623;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1624;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1625;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1626;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1627;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1628;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1629;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1630;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1631;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1632;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1633;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1634;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1635;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1636;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1637;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1638;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1639;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1640;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1641;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1642;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1643;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1644;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1645;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1646;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1647;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1648;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1649;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1650;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1651;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1652;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1653;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1654;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1655;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1656;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1657;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1658;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1659;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1660;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1661;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1662;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1663;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1664;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1665;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1666;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1667;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1668;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1669;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1670;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1671;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1672;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1673;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1674;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1675;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1676;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1677;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1678;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1679;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1680;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1681;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1682;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1683;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1684;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1685;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1686;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1687;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1688;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1689;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1690;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1691;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1692;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1693;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1694;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1695;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1696;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1697;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1698;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1699;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1700;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1701;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1702;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1703;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1704;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1705;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1706;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1707;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1708;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1709;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1710;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1711;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1712;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1713;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1714;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1715;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1716;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1717;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1718;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1719;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1720;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1721;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1722;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1723;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1724;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1725;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1726;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1727;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1728;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1729;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1730;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1731;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1732;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1733;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1734;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1735;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1736;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1737;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1738;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1739;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1740;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1741;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1742;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1743;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1744;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1745;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1746;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1747;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1748;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1749;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1750;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1751;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1752;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1753;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1754;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1755;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1756;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1757;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1758;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1759;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1760;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1761;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1762;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1763;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1764;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1765;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1766;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1767;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1768;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1769;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1770;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1771;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1772;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1773;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1774;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1775;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1776;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1777;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1778;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1779;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1780;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1781;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1782;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1783;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1784;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1785;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1786;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1787;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1788;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1789;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1790;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1791;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1792;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1793;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1794;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1795;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1796;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1797;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1798;
DELETE FROM `lineitem` WHERE `l_orderkey` = 1799;

-- Deleting 1 records from nation
DELETE FROM `nation` WHERE `n_nationkey` = 25;

-- Deleting 10 records from part
DELETE FROM `part` WHERE `p_partkey` = 200;
DELETE FROM `part` WHERE `p_partkey` = 201;
DELETE FROM `part` WHERE `p_partkey` = 202;
DELETE FROM `part` WHERE `p_partkey` = 203;
DELETE FROM `part` WHERE `p_partkey` = 204;
DELETE FROM `part` WHERE `p_partkey` = 205;
DELETE FROM `part` WHERE `p_partkey` = 206;
DELETE FROM `part` WHERE `p_partkey` = 207;
DELETE FROM `part` WHERE `p_partkey` = 208;
DELETE FROM `part` WHERE `p_partkey` = 209;

-- UPDATE Records
-- ===============
-- Records with different values between production and backup

-- Updating 7 records in customer
UPDATE `customer` SET `c_name` = 'Customer#000000000', `c_nationkey` = 2, `c_acctbal` = 2095.23, `c_mktsegment` = 'FURNITURE' WHERE `c_custkey` = 0;
UPDATE `customer` SET `c_name` = 'Customer#000000038', `c_nationkey` = 6, `c_acctbal` = 5371.41, `c_mktsegment` = 'HOUSEHOLD' WHERE `c_custkey` = 38;
UPDATE `customer` SET `c_name` = 'Customer#000000039', `c_nationkey` = 15, `c_acctbal` = 944.51, `c_mktsegment` = 'HOUSEHOLD' WHERE `c_custkey` = 39;
UPDATE `customer` SET `c_name` = 'Customer#000000040', `c_nationkey` = 4, `c_acctbal` = 8422.75, `c_mktsegment` = 'FURNITURE' WHERE `c_custkey` = 40;
UPDATE `customer` SET `c_name` = 'Customer#000000065', `c_nationkey` = 8, `c_acctbal` = 4353.24, `c_mktsegment` = 'BUILDING' WHERE `c_custkey` = 65;
UPDATE `customer` SET `c_name` = 'Customer#000000085', `c_nationkey` = 17, `c_acctbal` = 185.16, `c_mktsegment` = 'BUILDING' WHERE `c_custkey` = 85;
UPDATE `customer` SET `c_name` = 'Customer#000000141', `c_nationkey` = 5, `c_acctbal` = 441.64, `c_mktsegment` = 'FURNITURE' WHERE `c_custkey` = 141;

-- Updating 75 records in orders
UPDATE `orders` SET `o_custkey` = 44, `o_orderstatus` = 'F', `o_totalprice` = 290638.71, `o_orderdate` = '1998-07-18 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 15;
UPDATE `orders` SET `o_custkey` = 27, `o_orderstatus` = 'O', `o_totalprice` = 417929.57, `o_orderdate` = '1997-10-14 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 32;
UPDATE `orders` SET `o_custkey` = 96, `o_orderstatus` = 'F', `o_totalprice` = 278072.55, `o_orderdate` = '1995-12-14 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 84;
UPDATE `orders` SET `o_custkey` = 111, `o_orderstatus` = 'O', `o_totalprice` = 278382.83, `o_orderdate` = '1998-02-04 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 91;
UPDATE `orders` SET `o_custkey` = 116, `o_orderstatus` = 'P', `o_totalprice` = 54536.24, `o_orderdate` = '1998-08-27 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 100;
UPDATE `orders` SET `o_custkey` = 111, `o_orderstatus` = 'O', `o_totalprice` = 35241.81, `o_orderdate` = '1997-06-10 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 111;
UPDATE `orders` SET `o_custkey` = 97, `o_orderstatus` = 'F', `o_totalprice` = 276574.31, `o_orderdate` = '1999-05-27 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 181;
UPDATE `orders` SET `o_custkey` = 132, `o_orderstatus` = 'F', `o_totalprice` = 249801.42, `o_orderdate` = '1998-01-08 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 184;
UPDATE `orders` SET `o_custkey` = 37, `o_orderstatus` = 'F', `o_totalprice` = 475297.64, `o_orderdate` = '1998-08-08 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 187;
UPDATE `orders` SET `o_custkey` = 46, `o_orderstatus` = 'O', `o_totalprice` = 27609.22, `o_orderdate` = '1996-01-15 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 190;
UPDATE `orders` SET `o_custkey` = 45, `o_orderstatus` = 'P', `o_totalprice` = 468594.3, `o_orderdate` = '1995-03-14 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 192;
UPDATE `orders` SET `o_custkey` = 111, `o_orderstatus` = 'F', `o_totalprice` = 316011.67, `o_orderdate` = '1996-02-25 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 214;
UPDATE `orders` SET `o_custkey` = 141, `o_orderstatus` = 'F', `o_totalprice` = 232396.14, `o_orderdate` = '1997-04-04 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 243;
UPDATE `orders` SET `o_custkey` = 67, `o_orderstatus` = 'O', `o_totalprice` = 376976.81, `o_orderdate` = '1995-05-21 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 288;
UPDATE `orders` SET `o_custkey` = 24, `o_orderstatus` = 'P', `o_totalprice` = 211825.05, `o_orderdate` = '1999-02-21 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 310;
UPDATE `orders` SET `o_custkey` = 60, `o_orderstatus` = 'P', `o_totalprice` = 358594.76, `o_orderdate` = '1995-12-02 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 325;
UPDATE `orders` SET `o_custkey` = 51, `o_orderstatus` = 'F', `o_totalprice` = 197647.96, `o_orderdate` = '2001-07-10 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 347;
UPDATE `orders` SET `o_custkey` = 112, `o_orderstatus` = 'O', `o_totalprice` = 287835.54, `o_orderdate` = '1997-10-14 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 353;
UPDATE `orders` SET `o_custkey` = 95, `o_orderstatus` = 'F', `o_totalprice` = 234169.41, `o_orderdate` = '1999-09-28 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 354;
UPDATE `orders` SET `o_custkey` = 42, `o_orderstatus` = 'O', `o_totalprice` = 291758.55, `o_orderdate` = '1995-11-14 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 368;
UPDATE `orders` SET `o_custkey` = 47, `o_orderstatus` = 'P', `o_totalprice` = 344687.35, `o_orderdate` = '1996-01-02 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 385;
UPDATE `orders` SET `o_custkey` = 83, `o_orderstatus` = 'F', `o_totalprice` = 113972.37, `o_orderdate` = '1996-08-31 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 400;
UPDATE `orders` SET `o_custkey` = 13, `o_orderstatus` = 'O', `o_totalprice` = 495445.37, `o_orderdate` = '1999-04-09 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 402;
UPDATE `orders` SET `o_custkey` = 97, `o_orderstatus` = 'P', `o_totalprice` = 434972.46, `o_orderdate` = '1997-08-02 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 441;
UPDATE `orders` SET `o_custkey` = 19, `o_orderstatus` = 'P', `o_totalprice` = 495509.12, `o_orderdate` = '1999-07-31 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 454;
UPDATE `orders` SET `o_custkey` = 87, `o_orderstatus` = 'O', `o_totalprice` = 365783.91, `o_orderdate` = '1999-11-16 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 492;
UPDATE `orders` SET `o_custkey` = 49, `o_orderstatus` = 'O', `o_totalprice` = 321940.6, `o_orderdate` = '2000-05-12 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 520;
UPDATE `orders` SET `o_custkey` = 34, `o_orderstatus` = 'F', `o_totalprice` = 229490.79, `o_orderdate` = '1995-02-23 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 544;
UPDATE `orders` SET `o_custkey` = 42, `o_orderstatus` = 'O', `o_totalprice` = 201251.86, `o_orderdate` = '1996-05-30 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 562;
UPDATE `orders` SET `o_custkey` = 116, `o_orderstatus` = 'P', `o_totalprice` = 487275.95, `o_orderdate` = '1995-08-18 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 581;
UPDATE `orders` SET `o_custkey` = 42, `o_orderstatus` = 'P', `o_totalprice` = 498537.44, `o_orderdate` = '1998-03-22 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 588;
UPDATE `orders` SET `o_custkey` = 86, `o_orderstatus` = 'F', `o_totalprice` = 104610.95, `o_orderdate` = '1997-08-31 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 616;
UPDATE `orders` SET `o_custkey` = 75, `o_orderstatus` = 'O', `o_totalprice` = 123068.94, `o_orderdate` = '1998-06-01 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 623;
UPDATE `orders` SET `o_custkey` = 102, `o_orderstatus` = 'P', `o_totalprice` = 92475.76, `o_orderdate` = '2000-03-29 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 654;
UPDATE `orders` SET `o_custkey` = 14, `o_orderstatus` = 'P', `o_totalprice` = 395641.7, `o_orderdate` = '1997-11-19 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 675;
UPDATE `orders` SET `o_custkey` = 17, `o_orderstatus` = 'F', `o_totalprice` = 459413.64, `o_orderdate` = '1995-11-03 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 733;
UPDATE `orders` SET `o_custkey` = 27, `o_orderstatus` = 'O', `o_totalprice` = 224780.67, `o_orderdate` = '2001-07-19 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 754;
UPDATE `orders` SET `o_custkey` = 79, `o_orderstatus` = 'O', `o_totalprice` = 24689.28, `o_orderdate` = '2001-01-11 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 780;
UPDATE `orders` SET `o_custkey` = 123, `o_orderstatus` = 'F', `o_totalprice` = 94159.37, `o_orderdate` = '1997-05-07 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 793;
UPDATE `orders` SET `o_custkey` = 52, `o_orderstatus` = 'F', `o_totalprice` = 468915.01, `o_orderdate` = '1995-06-08 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 794;
UPDATE `orders` SET `o_custkey` = 84, `o_orderstatus` = 'P', `o_totalprice` = 81927.79, `o_orderdate` = '1995-06-21 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 805;
UPDATE `orders` SET `o_custkey` = 29, `o_orderstatus` = 'P', `o_totalprice` = 1411.48, `o_orderdate` = '1999-10-28 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 835;
UPDATE `orders` SET `o_custkey` = 49, `o_orderstatus` = 'O', `o_totalprice` = 40579.13, `o_orderdate` = '1996-06-04 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 945;
UPDATE `orders` SET `o_custkey` = 57, `o_orderstatus` = 'P', `o_totalprice` = 114811.62, `o_orderdate` = '1996-04-19 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 950;
UPDATE `orders` SET `o_custkey` = 69, `o_orderstatus` = 'O', `o_totalprice` = 95200.67, `o_orderdate` = '1995-07-22 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 951;
UPDATE `orders` SET `o_custkey` = 56, `o_orderstatus` = 'O', `o_totalprice` = 242250.86, `o_orderdate` = '1997-08-27 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 961;
UPDATE `orders` SET `o_custkey` = 45, `o_orderstatus` = 'P', `o_totalprice` = 53523.54, `o_orderdate` = '1996-02-24 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 964;
UPDATE `orders` SET `o_custkey` = 38, `o_orderstatus` = 'P', `o_totalprice` = 289934.28, `o_orderdate` = '1997-04-22 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 977;
UPDATE `orders` SET `o_custkey` = 127, `o_orderstatus` = 'P', `o_totalprice` = 24634.52, `o_orderdate` = '1995-03-03 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 990;
UPDATE `orders` SET `o_custkey` = 138, `o_orderstatus` = 'O', `o_totalprice` = 300209.83, `o_orderdate` = '2000-04-03 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 993;
UPDATE `orders` SET `o_custkey` = 137, `o_orderstatus` = 'P', `o_totalprice` = 51791.21, `o_orderdate` = '1997-12-03 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 1002;
UPDATE `orders` SET `o_custkey` = 67, `o_orderstatus` = 'O', `o_totalprice` = 112295.03, `o_orderdate` = '1995-04-10 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 1014;
UPDATE `orders` SET `o_custkey` = 22, `o_orderstatus` = 'F', `o_totalprice` = 295222.8, `o_orderdate` = '1999-04-05 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 1032;
UPDATE `orders` SET `o_custkey` = 74, `o_orderstatus` = 'O', `o_totalprice` = 387151.03, `o_orderdate` = '2001-03-10 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 1033;
UPDATE `orders` SET `o_custkey` = 36, `o_orderstatus` = 'O', `o_totalprice` = 19116.53, `o_orderdate` = '1995-07-21 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 1056;
UPDATE `orders` SET `o_custkey` = 92, `o_orderstatus` = 'O', `o_totalprice` = 329764.23, `o_orderdate` = '1999-05-06 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1095;
UPDATE `orders` SET `o_custkey` = 139, `o_orderstatus` = 'F', `o_totalprice` = 393606.57, `o_orderdate` = '1997-07-17 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1102;
UPDATE `orders` SET `o_custkey` = 29, `o_orderstatus` = 'F', `o_totalprice` = 410984.96, `o_orderdate` = '1997-09-03 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1114;
UPDATE `orders` SET `o_custkey` = 42, `o_orderstatus` = 'P', `o_totalprice` = 224115.65, `o_orderdate` = '1996-08-18 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1156;
UPDATE `orders` SET `o_custkey` = 43, `o_orderstatus` = 'P', `o_totalprice` = 2236.49, `o_orderdate` = '1998-12-06 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1176;
UPDATE `orders` SET `o_custkey` = 146, `o_orderstatus` = 'O', `o_totalprice` = 341004.99, `o_orderdate` = '1995-05-06 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 1193;
UPDATE `orders` SET `o_custkey` = 105, `o_orderstatus` = 'F', `o_totalprice` = 55184.69, `o_orderdate` = '1997-01-03 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1211;
UPDATE `orders` SET `o_custkey` = 116, `o_orderstatus` = 'O', `o_totalprice` = 443058.46, `o_orderdate` = '1996-07-23 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 1227;
UPDATE `orders` SET `o_custkey` = 29, `o_orderstatus` = 'O', `o_totalprice` = 236005.12, `o_orderdate` = '2001-05-01 00:00:00', `o_orderpriority` = '3-MEDIUM' WHERE `o_orderkey` = 1230;
UPDATE `orders` SET `o_custkey` = 57, `o_orderstatus` = 'O', `o_totalprice` = 257645.35, `o_orderdate` = '1997-07-12 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1244;
UPDATE `orders` SET `o_custkey` = 53, `o_orderstatus` = 'F', `o_totalprice` = 154080.27, `o_orderdate` = '1996-01-04 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1254;
UPDATE `orders` SET `o_custkey` = 13, `o_orderstatus` = 'F', `o_totalprice` = 434859.1, `o_orderdate` = '1997-03-14 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1281;
UPDATE `orders` SET `o_custkey` = 63, `o_orderstatus` = 'O', `o_totalprice` = 113663.44, `o_orderdate` = '1997-05-11 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1294;
UPDATE `orders` SET `o_custkey` = 140, `o_orderstatus` = 'F', `o_totalprice` = 442696.28, `o_orderdate` = '2000-12-18 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1311;
UPDATE `orders` SET `o_custkey` = 16, `o_orderstatus` = 'F', `o_totalprice` = 54087.95, `o_orderdate` = '1999-04-08 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1315;
UPDATE `orders` SET `o_custkey` = 135, `o_orderstatus` = 'F', `o_totalprice` = 173579.41, `o_orderdate` = '1995-01-15 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 1358;
UPDATE `orders` SET `o_custkey` = 36, `o_orderstatus` = 'F', `o_totalprice` = 139795.23, `o_orderdate` = '1995-02-19 00:00:00', `o_orderpriority` = '1-URGENT' WHERE `o_orderkey` = 1442;
UPDATE `orders` SET `o_custkey` = 47, `o_orderstatus` = 'O', `o_totalprice` = 466557.03, `o_orderdate` = '1999-10-12 00:00:00', `o_orderpriority` = '2-HIGH' WHERE `o_orderkey` = 1467;
UPDATE `orders` SET `o_custkey` = 54, `o_orderstatus` = 'P', `o_totalprice` = 464001.25, `o_orderdate` = '1996-06-11 00:00:00', `o_orderpriority` = '4-NOT SPECIFIED' WHERE `o_orderkey` = 1470;
UPDATE `orders` SET `o_custkey` = 66, `o_orderstatus` = 'F', `o_totalprice` = 399285.98, `o_orderdate` = '1995-01-23 00:00:00', `o_orderpriority` = '5-LOW' WHERE `o_orderkey` = 1494;

-- Updating 139 records in lineitem
UPDATE `lineitem` SET `l_partkey` = 155, `l_suppkey` = 0, `l_linenumber` = 4, `l_quantity` = 23.0, `l_extendedprice` = 68088.3, `l_discount` = 0.07, `l_tax` = 0.04, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '2000-03-29 00:00:00' WHERE `l_orderkey` = 526;
UPDATE `lineitem` SET `l_partkey` = 38, `l_suppkey` = 4, `l_linenumber` = 3, `l_quantity` = 41.0, `l_extendedprice` = 28165.52, `l_discount` = 0.04, `l_tax` = 0.02, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '2000-08-22 00:00:00' WHERE `l_orderkey` = 1113;
UPDATE `lineitem` SET `l_partkey` = 127, `l_suppkey` = 5, `l_linenumber` = 3, `l_quantity` = 50.0, `l_extendedprice` = 40713.05, `l_discount` = 0.04, `l_tax` = 0.04, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1998-03-25 00:00:00' WHERE `l_orderkey` = 403;
UPDATE `lineitem` SET `l_partkey` = 136, `l_suppkey` = 8, `l_linenumber` = 5, `l_quantity` = 18.0, `l_extendedprice` = 70251.68, `l_discount` = 0.07, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2001-02-08 00:00:00' WHERE `l_orderkey` = 1312;
UPDATE `lineitem` SET `l_partkey` = 58, `l_suppkey` = 3, `l_linenumber` = 1, `l_quantity` = 34.0, `l_extendedprice` = 67483.27, `l_discount` = 0.01, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1998-01-08 00:00:00' WHERE `l_orderkey` = 509;
UPDATE `lineitem` SET `l_partkey` = 33, `l_suppkey` = 1, `l_linenumber` = 6, `l_quantity` = 18.0, `l_extendedprice` = 21808.22, `l_discount` = 0.04, `l_tax` = 0.05, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1995-05-30 00:00:00' WHERE `l_orderkey` = 921;
UPDATE `lineitem` SET `l_partkey` = 33, `l_suppkey` = 8, `l_linenumber` = 3, `l_quantity` = 19.0, `l_extendedprice` = 91828.4, `l_discount` = 0.05, `l_tax` = 0.08, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1997-01-15 00:00:00' WHERE `l_orderkey` = 873;
UPDATE `lineitem` SET `l_partkey` = 48, `l_suppkey` = 7, `l_linenumber` = 3, `l_quantity` = 49.0, `l_extendedprice` = 83225.53, `l_discount` = 0.04, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-08-25 00:00:00' WHERE `l_orderkey` = 104;
UPDATE `lineitem` SET `l_partkey` = 75, `l_suppkey` = 5, `l_linenumber` = 2, `l_quantity` = 36.0, `l_extendedprice` = 81879.83, `l_discount` = 0.04, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2001-05-05 00:00:00' WHERE `l_orderkey` = 1129;
UPDATE `lineitem` SET `l_partkey` = 95, `l_suppkey` = 0, `l_linenumber` = 5, `l_quantity` = 10.0, `l_extendedprice` = 14966.47, `l_discount` = 0.01, `l_tax` = 0.05, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1995-05-18 00:00:00' WHERE `l_orderkey` = 795;
UPDATE `lineitem` SET `l_partkey` = 79, `l_suppkey` = 1, `l_linenumber` = 4, `l_quantity` = 42.0, `l_extendedprice` = 81291.53, `l_discount` = 0.03, `l_tax` = 0.04, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1999-03-12 00:00:00' WHERE `l_orderkey` = 1392;
UPDATE `lineitem` SET `l_partkey` = 23, `l_suppkey` = 9, `l_linenumber` = 7, `l_quantity` = 27.0, `l_extendedprice` = 26547.1, `l_discount` = 0.08, `l_tax` = 0.03, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2001-07-06 00:00:00' WHERE `l_orderkey` = 625;
UPDATE `lineitem` SET `l_partkey` = 147, `l_suppkey` = 2, `l_linenumber` = 2, `l_quantity` = 46.0, `l_extendedprice` = 21722.62, `l_discount` = 0.09, `l_tax` = 0.04, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1999-05-19 00:00:00' WHERE `l_orderkey` = 977;
UPDATE `lineitem` SET `l_partkey` = 88, `l_suppkey` = 7, `l_linenumber` = 1, `l_quantity` = 49.0, `l_extendedprice` = 64025.7, `l_discount` = 0.06, `l_tax` = 0.02, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-11-29 00:00:00' WHERE `l_orderkey` = 623;
UPDATE `lineitem` SET `l_partkey` = 187, `l_suppkey` = 5, `l_linenumber` = 6, `l_quantity` = 2.0, `l_extendedprice` = 25967.91, `l_discount` = 0.08, `l_tax` = 0.07, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1997-10-17 00:00:00' WHERE `l_orderkey` = 65;
UPDATE `lineitem` SET `l_partkey` = 4, `l_suppkey` = 2, `l_linenumber` = 3, `l_quantity` = 32.0, `l_extendedprice` = 6084.16, `l_discount` = 0.07, `l_tax` = 0.05, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2001-09-14 00:00:00' WHERE `l_orderkey` = 781;
UPDATE `lineitem` SET `l_partkey` = 93, `l_suppkey` = 1, `l_linenumber` = 2, `l_quantity` = 40.0, `l_extendedprice` = 62500.51, `l_discount` = 0.01, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1996-11-24 00:00:00' WHERE `l_orderkey` = 1168;
UPDATE `lineitem` SET `l_partkey` = 116, `l_suppkey` = 9, `l_linenumber` = 5, `l_quantity` = 19.0, `l_extendedprice` = 95374.11, `l_discount` = 0.04, `l_tax` = 0.03, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2000-08-08 00:00:00' WHERE `l_orderkey` = 1395;
UPDATE `lineitem` SET `l_partkey` = 45, `l_suppkey` = 4, `l_linenumber` = 6, `l_quantity` = 3.0, `l_extendedprice` = 85575.54, `l_discount` = 0.06, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1996-10-06 00:00:00' WHERE `l_orderkey` = 1467;
UPDATE `lineitem` SET `l_partkey` = 132, `l_suppkey` = 5, `l_linenumber` = 4, `l_quantity` = 9.0, `l_extendedprice` = 33689.05, `l_discount` = 0.03, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1998-07-11 00:00:00' WHERE `l_orderkey` = 925;
UPDATE `lineitem` SET `l_partkey` = 84, `l_suppkey` = 0, `l_linenumber` = 5, `l_quantity` = 48.0, `l_extendedprice` = 71252.0, `l_discount` = 0.02, `l_tax` = 0.07, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1996-09-16 00:00:00' WHERE `l_orderkey` = 144;
UPDATE `lineitem` SET `l_partkey` = 133, `l_suppkey` = 8, `l_linenumber` = 5, `l_quantity` = 46.0, `l_extendedprice` = 7803.98, `l_discount` = 0.09, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1999-03-23 00:00:00' WHERE `l_orderkey` = 388;
UPDATE `lineitem` SET `l_partkey` = 147, `l_suppkey` = 4, `l_linenumber` = 2, `l_quantity` = 14.0, `l_extendedprice` = 103664.93, `l_discount` = 0.05, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1999-12-23 00:00:00' WHERE `l_orderkey` = 1030;
UPDATE `lineitem` SET `l_partkey` = 112, `l_suppkey` = 6, `l_linenumber` = 6, `l_quantity` = 15.0, `l_extendedprice` = 16481.72, `l_discount` = 0.03, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1998-03-24 00:00:00' WHERE `l_orderkey` = 1051;
UPDATE `lineitem` SET `l_partkey` = 88, `l_suppkey` = 7, `l_linenumber` = 6, `l_quantity` = 26.0, `l_extendedprice` = 32116.98, `l_discount` = 0.07, `l_tax` = 0.04, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1997-05-31 00:00:00' WHERE `l_orderkey` = 221;
UPDATE `lineitem` SET `l_partkey` = 172, `l_suppkey` = 3, `l_linenumber` = 2, `l_quantity` = 23.0, `l_extendedprice` = 94539.49, `l_discount` = 0.03, `l_tax` = 0.03, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1996-03-31 00:00:00' WHERE `l_orderkey` = 233;
UPDATE `lineitem` SET `l_partkey` = 153, `l_suppkey` = 0, `l_linenumber` = 4, `l_quantity` = 48.0, `l_extendedprice` = 76501.14, `l_discount` = 0.09, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1997-11-15 00:00:00' WHERE `l_orderkey` = 1217;
UPDATE `lineitem` SET `l_partkey` = 174, `l_suppkey` = 8, `l_linenumber` = 3, `l_quantity` = 9.0, `l_extendedprice` = 27427.66, `l_discount` = 0.01, `l_tax` = 0.08, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-05-16 00:00:00' WHERE `l_orderkey` = 1440;
UPDATE `lineitem` SET `l_partkey` = 90, `l_suppkey` = 2, `l_linenumber` = 7, `l_quantity` = 17.0, `l_extendedprice` = 16615.42, `l_discount` = 0.06, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1995-04-22 00:00:00' WHERE `l_orderkey` = 770;
UPDATE `lineitem` SET `l_partkey` = 16, `l_suppkey` = 1, `l_linenumber` = 5, `l_quantity` = 13.0, `l_extendedprice` = 3686.57, `l_discount` = 0.07, `l_tax` = 0.03, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2001-07-13 00:00:00' WHERE `l_orderkey` = 1179;
UPDATE `lineitem` SET `l_partkey` = 16, `l_suppkey` = 3, `l_linenumber` = 3, `l_quantity` = 28.0, `l_extendedprice` = 39475.36, `l_discount` = 0.06, `l_tax` = 0.06, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1996-03-10 00:00:00' WHERE `l_orderkey` = 592;
UPDATE `lineitem` SET `l_partkey` = 178, `l_suppkey` = 1, `l_linenumber` = 3, `l_quantity` = 41.0, `l_extendedprice` = 67778.68, `l_discount` = 0.08, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2000-01-23 00:00:00' WHERE `l_orderkey` = 549;
UPDATE `lineitem` SET `l_partkey` = 95, `l_suppkey` = 5, `l_linenumber` = 7, `l_quantity` = 11.0, `l_extendedprice` = 103794.98, `l_discount` = 0.1, `l_tax` = 0.03, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2000-10-15 00:00:00' WHERE `l_orderkey` = 994;
UPDATE `lineitem` SET `l_partkey` = 121, `l_suppkey` = 4, `l_linenumber` = 1, `l_quantity` = 40.0, `l_extendedprice` = 38229.21, `l_discount` = 0.05, `l_tax` = 0.04, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2000-10-21 00:00:00' WHERE `l_orderkey` = 1257;
UPDATE `lineitem` SET `l_partkey` = 109, `l_suppkey` = 4, `l_linenumber` = 3, `l_quantity` = 19.0, `l_extendedprice` = 49412.8, `l_discount` = 0.05, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-08-09 00:00:00' WHERE `l_orderkey` = 252;
UPDATE `lineitem` SET `l_partkey` = 189, `l_suppkey` = 7, `l_linenumber` = 5, `l_quantity` = 24.0, `l_extendedprice` = 92079.26, `l_discount` = 0.06, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1995-05-12 00:00:00' WHERE `l_orderkey` = 238;
UPDATE `lineitem` SET `l_partkey` = 199, `l_suppkey` = 1, `l_linenumber` = 5, `l_quantity` = 26.0, `l_extendedprice` = 84015.08, `l_discount` = 0.04, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1997-04-23 00:00:00' WHERE `l_orderkey` = 724;
UPDATE `lineitem` SET `l_partkey` = 45, `l_suppkey` = 3, `l_linenumber` = 4, `l_quantity` = 20.0, `l_extendedprice` = 39519.36, `l_discount` = 0.02, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1995-08-13 00:00:00' WHERE `l_orderkey` = 374;
UPDATE `lineitem` SET `l_partkey` = 90, `l_suppkey` = 2, `l_linenumber` = 1, `l_quantity` = 35.0, `l_extendedprice` = 58364.37, `l_discount` = 0.03, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1995-03-07 00:00:00' WHERE `l_orderkey` = 1259;
UPDATE `lineitem` SET `l_partkey` = 172, `l_suppkey` = 5, `l_linenumber` = 3, `l_quantity` = 37.0, `l_extendedprice` = 72801.79, `l_discount` = 0.02, `l_tax` = 0.02, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1995-09-13 00:00:00' WHERE `l_orderkey` = 1;
UPDATE `lineitem` SET `l_partkey` = 123, `l_suppkey` = 3, `l_linenumber` = 5, `l_quantity` = 5.0, `l_extendedprice` = 40078.91, `l_discount` = 0.05, `l_tax` = 0.01, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1995-01-30 00:00:00' WHERE `l_orderkey` = 343;
UPDATE `lineitem` SET `l_partkey` = 64, `l_suppkey` = 2, `l_linenumber` = 2, `l_quantity` = 24.0, `l_extendedprice` = 69768.2, `l_discount` = 0.1, `l_tax` = 0.08, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2000-11-21 00:00:00' WHERE `l_orderkey` = 1394;
UPDATE `lineitem` SET `l_partkey` = 160, `l_suppkey` = 7, `l_linenumber` = 4, `l_quantity` = 28.0, `l_extendedprice` = 103729.34, `l_discount` = 0.07, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2001-02-13 00:00:00' WHERE `l_orderkey` = 924;
UPDATE `lineitem` SET `l_partkey` = 0, `l_suppkey` = 8, `l_linenumber` = 2, `l_quantity` = 8.0, `l_extendedprice` = 29732.19, `l_discount` = 0.01, `l_tax` = 0.07, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1999-03-20 00:00:00' WHERE `l_orderkey` = 1075;
UPDATE `lineitem` SET `l_partkey` = 145, `l_suppkey` = 5, `l_linenumber` = 3, `l_quantity` = 27.0, `l_extendedprice` = 25956.32, `l_discount` = 0.09, `l_tax` = 0.02, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2001-07-11 00:00:00' WHERE `l_orderkey` = 1066;
UPDATE `lineitem` SET `l_partkey` = 158, `l_suppkey` = 2, `l_linenumber` = 1, `l_quantity` = 6.0, `l_extendedprice` = 71950.03, `l_discount` = 0.05, `l_tax` = 0.08, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1998-11-15 00:00:00' WHERE `l_orderkey` = 660;
UPDATE `lineitem` SET `l_partkey` = 87, `l_suppkey` = 7, `l_linenumber` = 1, `l_quantity` = 44.0, `l_extendedprice` = 103091.71, `l_discount` = 0.09, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '2001-09-03 00:00:00' WHERE `l_orderkey` = 67;
UPDATE `lineitem` SET `l_partkey` = 128, `l_suppkey` = 1, `l_linenumber` = 4, `l_quantity` = 40.0, `l_extendedprice` = 40604.31, `l_discount` = 0.04, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1998-06-23 00:00:00' WHERE `l_orderkey` = 247;
UPDATE `lineitem` SET `l_partkey` = 150, `l_suppkey` = 3, `l_linenumber` = 3, `l_quantity` = 30.0, `l_extendedprice` = 14483.68, `l_discount` = 0.05, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '2000-03-03 00:00:00' WHERE `l_orderkey` = 1445;
UPDATE `lineitem` SET `l_partkey` = 168, `l_suppkey` = 5, `l_linenumber` = 3, `l_quantity` = 40.0, `l_extendedprice` = 7474.61, `l_discount` = 0.09, `l_tax` = 0.04, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1996-03-22 00:00:00' WHERE `l_orderkey` = 377;
UPDATE `lineitem` SET `l_partkey` = 172, `l_suppkey` = 5, `l_linenumber` = 7, `l_quantity` = 32.0, `l_extendedprice` = 83148.87, `l_discount` = 0.07, `l_tax` = 0.07, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1998-08-21 00:00:00' WHERE `l_orderkey` = 158;
UPDATE `lineitem` SET `l_partkey` = 85, `l_suppkey` = 0, `l_linenumber` = 5, `l_quantity` = 12.0, `l_extendedprice` = 6632.21, `l_discount` = 0.0, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2000-11-24 00:00:00' WHERE `l_orderkey` = 801;
UPDATE `lineitem` SET `l_partkey` = 197, `l_suppkey` = 0, `l_linenumber` = 6, `l_quantity` = 26.0, `l_extendedprice` = 66447.13, `l_discount` = 0.09, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-04-16 00:00:00' WHERE `l_orderkey` = 930;
UPDATE `lineitem` SET `l_partkey` = 38, `l_suppkey` = 9, `l_linenumber` = 4, `l_quantity` = 16.0, `l_extendedprice` = 10515.72, `l_discount` = 0.05, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1997-03-22 00:00:00' WHERE `l_orderkey` = 336;
UPDATE `lineitem` SET `l_partkey` = 36, `l_suppkey` = 2, `l_linenumber` = 1, `l_quantity` = 46.0, `l_extendedprice` = 40896.69, `l_discount` = 0.05, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1998-03-08 00:00:00' WHERE `l_orderkey` = 1494;
UPDATE `lineitem` SET `l_partkey` = 177, `l_suppkey` = 1, `l_linenumber` = 2, `l_quantity` = 48.0, `l_extendedprice` = 2440.51, `l_discount` = 0.09, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2001-06-13 00:00:00' WHERE `l_orderkey` = 413;
UPDATE `lineitem` SET `l_partkey` = 93, `l_suppkey` = 4, `l_linenumber` = 2, `l_quantity` = 15.0, `l_extendedprice` = 81983.17, `l_discount` = 0.05, `l_tax` = 0.07, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2001-08-04 00:00:00' WHERE `l_orderkey` = 1125;
UPDATE `lineitem` SET `l_partkey` = 133, `l_suppkey` = 9, `l_linenumber` = 3, `l_quantity` = 47.0, `l_extendedprice` = 13177.78, `l_discount` = 0.08, `l_tax` = 0.03, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1995-05-17 00:00:00' WHERE `l_orderkey` = 1452;
UPDATE `lineitem` SET `l_partkey` = 171, `l_suppkey` = 9, `l_linenumber` = 1, `l_quantity` = 43.0, `l_extendedprice` = 85966.47, `l_discount` = 0.05, `l_tax` = 0.02, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '2001-10-07 00:00:00' WHERE `l_orderkey` = 914;
UPDATE `lineitem` SET `l_partkey` = 48, `l_suppkey` = 5, `l_linenumber` = 2, `l_quantity` = 47.0, `l_extendedprice` = 53312.51, `l_discount` = 0.05, `l_tax` = 0.08, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1995-12-13 00:00:00' WHERE `l_orderkey` = 1254;
UPDATE `lineitem` SET `l_partkey` = 98, `l_suppkey` = 8, `l_linenumber` = 4, `l_quantity` = 2.0, `l_extendedprice` = 4605.61, `l_discount` = 0.05, `l_tax` = 0.08, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2001-10-15 00:00:00' WHERE `l_orderkey` = 236;
UPDATE `lineitem` SET `l_partkey` = 185, `l_suppkey` = 3, `l_linenumber` = 5, `l_quantity` = 35.0, `l_extendedprice` = 28420.62, `l_discount` = 0.02, `l_tax` = 0.01, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1998-09-26 00:00:00' WHERE `l_orderkey` = 544;
UPDATE `lineitem` SET `l_partkey` = 34, `l_suppkey` = 7, `l_linenumber` = 7, `l_quantity` = 40.0, `l_extendedprice` = 4142.39, `l_discount` = 0.03, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-10-19 00:00:00' WHERE `l_orderkey` = 1336;
UPDATE `lineitem` SET `l_partkey` = 139, `l_suppkey` = 9, `l_linenumber` = 3, `l_quantity` = 36.0, `l_extendedprice` = 17616.71, `l_discount` = 0.06, `l_tax` = 0.01, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1997-08-15 00:00:00' WHERE `l_orderkey` = 1190;
UPDATE `lineitem` SET `l_partkey` = 52, `l_suppkey` = 5, `l_linenumber` = 4, `l_quantity` = 48.0, `l_extendedprice` = 52791.76, `l_discount` = 0.1, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1997-02-07 00:00:00' WHERE `l_orderkey` = 744;
UPDATE `lineitem` SET `l_partkey` = 72, `l_suppkey` = 9, `l_linenumber` = 7, `l_quantity` = 25.0, `l_extendedprice` = 89995.62, `l_discount` = 0.08, `l_tax` = 0.05, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2000-02-14 00:00:00' WHERE `l_orderkey` = 1330;
UPDATE `lineitem` SET `l_partkey` = 197, `l_suppkey` = 1, `l_linenumber` = 3, `l_quantity` = 15.0, `l_extendedprice` = 92093.14, `l_discount` = 0.03, `l_tax` = 0.07, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1998-12-24 00:00:00' WHERE `l_orderkey` = 1041;
UPDATE `lineitem` SET `l_partkey` = 39, `l_suppkey` = 8, `l_linenumber` = 7, `l_quantity` = 7.0, `l_extendedprice` = 88678.26, `l_discount` = 0.09, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1999-03-11 00:00:00' WHERE `l_orderkey` = 1487;
UPDATE `lineitem` SET `l_partkey` = 81, `l_suppkey` = 0, `l_linenumber` = 6, `l_quantity` = 19.0, `l_extendedprice` = 55212.87, `l_discount` = 0.08, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1995-12-09 00:00:00' WHERE `l_orderkey` = 869;
UPDATE `lineitem` SET `l_partkey` = 115, `l_suppkey` = 4, `l_linenumber` = 7, `l_quantity` = 30.0, `l_extendedprice` = 96072.39, `l_discount` = 0.05, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-10-30 00:00:00' WHERE `l_orderkey` = 179;
UPDATE `lineitem` SET `l_partkey` = 58, `l_suppkey` = 9, `l_linenumber` = 2, `l_quantity` = 28.0, `l_extendedprice` = 102546.63, `l_discount` = 0.04, `l_tax` = 0.05, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1997-05-05 00:00:00' WHERE `l_orderkey` = 803;
UPDATE `lineitem` SET `l_partkey` = 182, `l_suppkey` = 6, `l_linenumber` = 7, `l_quantity` = 10.0, `l_extendedprice` = 80433.34, `l_discount` = 0.03, `l_tax` = 0.07, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1999-07-26 00:00:00' WHERE `l_orderkey` = 41;
UPDATE `lineitem` SET `l_partkey` = 166, `l_suppkey` = 1, `l_linenumber` = 5, `l_quantity` = 33.0, `l_extendedprice` = 99648.02, `l_discount` = 0.03, `l_tax` = 0.07, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1999-09-26 00:00:00' WHERE `l_orderkey` = 1049;
UPDATE `lineitem` SET `l_partkey` = 33, `l_suppkey` = 9, `l_linenumber` = 3, `l_quantity` = 27.0, `l_extendedprice` = 50085.61, `l_discount` = 0.01, `l_tax` = 0.07, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1997-07-18 00:00:00' WHERE `l_orderkey` = 671;
UPDATE `lineitem` SET `l_partkey` = 134, `l_suppkey` = 2, `l_linenumber` = 4, `l_quantity` = 15.0, `l_extendedprice` = 82799.53, `l_discount` = 0.07, `l_tax` = 0.03, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1999-05-22 00:00:00' WHERE `l_orderkey` = 793;
UPDATE `lineitem` SET `l_partkey` = 114, `l_suppkey` = 8, `l_linenumber` = 4, `l_quantity` = 33.0, `l_extendedprice` = 5035.72, `l_discount` = 0.0, `l_tax` = 0.02, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1999-11-30 00:00:00' WHERE `l_orderkey` = 953;
UPDATE `lineitem` SET `l_partkey` = 194, `l_suppkey` = 9, `l_linenumber` = 7, `l_quantity` = 39.0, `l_extendedprice` = 29592.8, `l_discount` = 0.03, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2000-07-17 00:00:00' WHERE `l_orderkey` = 750;
UPDATE `lineitem` SET `l_partkey` = 100, `l_suppkey` = 7, `l_linenumber` = 7, `l_quantity` = 35.0, `l_extendedprice` = 39663.21, `l_discount` = 0.0, `l_tax` = 0.07, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-05-13 00:00:00' WHERE `l_orderkey` = 590;
UPDATE `lineitem` SET `l_partkey` = 57, `l_suppkey` = 8, `l_linenumber` = 1, `l_quantity` = 6.0, `l_extendedprice` = 23433.43, `l_discount` = 0.06, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1999-07-20 00:00:00' WHERE `l_orderkey` = 686;
UPDATE `lineitem` SET `l_partkey` = 68, `l_suppkey` = 1, `l_linenumber` = 7, `l_quantity` = 15.0, `l_extendedprice` = 71377.5, `l_discount` = 0.07, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1996-02-03 00:00:00' WHERE `l_orderkey` = 316;
UPDATE `lineitem` SET `l_partkey` = 74, `l_suppkey` = 8, `l_linenumber` = 7, `l_quantity` = 33.0, `l_extendedprice` = 69570.12, `l_discount` = 0.05, `l_tax` = 0.04, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2000-10-18 00:00:00' WHERE `l_orderkey` = 936;
UPDATE `lineitem` SET `l_partkey` = 194, `l_suppkey` = 0, `l_linenumber` = 2, `l_quantity` = 5.0, `l_extendedprice` = 82847.82, `l_discount` = 0.05, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1995-09-19 00:00:00' WHERE `l_orderkey` = 723;
UPDATE `lineitem` SET `l_partkey` = 101, `l_suppkey` = 8, `l_linenumber` = 2, `l_quantity` = 41.0, `l_extendedprice` = 81803.63, `l_discount` = 0.02, `l_tax` = 0.0, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1999-04-26 00:00:00' WHERE `l_orderkey` = 1147;
UPDATE `lineitem` SET `l_partkey` = 7, `l_suppkey` = 7, `l_linenumber` = 5, `l_quantity` = 31.0, `l_extendedprice` = 29049.59, `l_discount` = 0.04, `l_tax` = 0.06, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1999-05-13 00:00:00' WHERE `l_orderkey` = 892;
UPDATE `lineitem` SET `l_partkey` = 173, `l_suppkey` = 4, `l_linenumber` = 2, `l_quantity` = 25.0, `l_extendedprice` = 7905.44, `l_discount` = 0.08, `l_tax` = 0.02, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1997-11-01 00:00:00' WHERE `l_orderkey` = 1115;
UPDATE `lineitem` SET `l_partkey` = 16, `l_suppkey` = 2, `l_linenumber` = 7, `l_quantity` = 12.0, `l_extendedprice` = 19149.74, `l_discount` = 0.07, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1999-01-08 00:00:00' WHERE `l_orderkey` = 1339;
UPDATE `lineitem` SET `l_partkey` = 93, `l_suppkey` = 1, `l_linenumber` = 5, `l_quantity` = 14.0, `l_extendedprice` = 97459.74, `l_discount` = 0.01, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-05-08 00:00:00' WHERE `l_orderkey` = 1306;
UPDATE `lineitem` SET `l_partkey` = 129, `l_suppkey` = 2, `l_linenumber` = 5, `l_quantity` = 32.0, `l_extendedprice` = 100081.01, `l_discount` = 0.03, `l_tax` = 0.04, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1996-04-29 00:00:00' WHERE `l_orderkey` = 546;
UPDATE `lineitem` SET `l_partkey` = 151, `l_suppkey` = 5, `l_linenumber` = 3, `l_quantity` = 41.0, `l_extendedprice` = 16300.65, `l_discount` = 0.04, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1995-05-19 00:00:00' WHERE `l_orderkey` = 1319;
UPDATE `lineitem` SET `l_partkey` = 15, `l_suppkey` = 5, `l_linenumber` = 5, `l_quantity` = 44.0, `l_extendedprice` = 15297.86, `l_discount` = 0.06, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1996-03-08 00:00:00' WHERE `l_orderkey` = 362;
UPDATE `lineitem` SET `l_partkey` = 67, `l_suppkey` = 2, `l_linenumber` = 6, `l_quantity` = 41.0, `l_extendedprice` = 3161.38, `l_discount` = 0.03, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1995-09-12 00:00:00' WHERE `l_orderkey` = 1450;
UPDATE `lineitem` SET `l_partkey` = 146, `l_suppkey` = 0, `l_linenumber` = 2, `l_quantity` = 50.0, `l_extendedprice` = 86075.91, `l_discount` = 0.05, `l_tax` = 0.06, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '2001-08-13 00:00:00' WHERE `l_orderkey` = 3;
UPDATE `lineitem` SET `l_partkey` = 1, `l_suppkey` = 8, `l_linenumber` = 3, `l_quantity` = 5.0, `l_extendedprice` = 53381.26, `l_discount` = 0.09, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1999-02-17 00:00:00' WHERE `l_orderkey` = 285;
UPDATE `lineitem` SET `l_partkey` = 97, `l_suppkey` = 4, `l_linenumber` = 1, `l_quantity` = 4.0, `l_extendedprice` = 87562.55, `l_discount` = 0.07, `l_tax` = 0.08, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1998-06-06 00:00:00' WHERE `l_orderkey` = 1032;
UPDATE `lineitem` SET `l_partkey` = 58, `l_suppkey` = 6, `l_linenumber` = 7, `l_quantity` = 45.0, `l_extendedprice` = 63742.39, `l_discount` = 0.03, `l_tax` = 0.07, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '2000-05-15 00:00:00' WHERE `l_orderkey` = 5;
UPDATE `lineitem` SET `l_partkey` = 16, `l_suppkey` = 2, `l_linenumber` = 1, `l_quantity` = 12.0, `l_extendedprice` = 44272.37, `l_discount` = 0.04, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-09-05 00:00:00' WHERE `l_orderkey` = 13;
UPDATE `lineitem` SET `l_partkey` = 60, `l_suppkey` = 1, `l_linenumber` = 7, `l_quantity` = 5.0, `l_extendedprice` = 58220.41, `l_discount` = 0.08, `l_tax` = 0.06, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1997-10-01 00:00:00' WHERE `l_orderkey` = 843;
UPDATE `lineitem` SET `l_partkey` = 41, `l_suppkey` = 3, `l_linenumber` = 6, `l_quantity` = 47.0, `l_extendedprice` = 37045.93, `l_discount` = 0.04, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1995-12-21 00:00:00' WHERE `l_orderkey` = 789;
UPDATE `lineitem` SET `l_partkey` = 199, `l_suppkey` = 0, `l_linenumber` = 3, `l_quantity` = 3.0, `l_extendedprice` = 79666.48, `l_discount` = 0.04, `l_tax` = 0.04, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1997-05-18 00:00:00' WHERE `l_orderkey` = 728;
UPDATE `lineitem` SET `l_partkey` = 58, `l_suppkey` = 5, `l_linenumber` = 2, `l_quantity` = 42.0, `l_extendedprice` = 87573.66, `l_discount` = 0.08, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1999-12-14 00:00:00' WHERE `l_orderkey` = 689;
UPDATE `lineitem` SET `l_partkey` = 18, `l_suppkey` = 3, `l_linenumber` = 2, `l_quantity` = 22.0, `l_extendedprice` = 37372.53, `l_discount` = 0.1, `l_tax` = 0.0, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2000-12-19 00:00:00' WHERE `l_orderkey` = 593;
UPDATE `lineitem` SET `l_partkey` = 60, `l_suppkey` = 8, `l_linenumber` = 5, `l_quantity` = 24.0, `l_extendedprice` = 81915.46, `l_discount` = 0.09, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-04-12 00:00:00' WHERE `l_orderkey` = 1269;
UPDATE `lineitem` SET `l_partkey` = 171, `l_suppkey` = 2, `l_linenumber` = 2, `l_quantity` = 36.0, `l_extendedprice` = 54254.69, `l_discount` = 0.05, `l_tax` = 0.03, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '2000-01-12 00:00:00' WHERE `l_orderkey` = 48;
UPDATE `lineitem` SET `l_partkey` = 165, `l_suppkey` = 1, `l_linenumber` = 6, `l_quantity` = 26.0, `l_extendedprice` = 50245.46, `l_discount` = 0.02, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-02-04 00:00:00' WHERE `l_orderkey` = 572;
UPDATE `lineitem` SET `l_partkey` = 132, `l_suppkey` = 7, `l_linenumber` = 2, `l_quantity` = 34.0, `l_extendedprice` = 90562.65, `l_discount` = 0.04, `l_tax` = 0.05, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '1997-11-02 00:00:00' WHERE `l_orderkey` = 170;
UPDATE `lineitem` SET `l_partkey` = 0, `l_suppkey` = 2, `l_linenumber` = 2, `l_quantity` = 44.0, `l_extendedprice` = 80236.47, `l_discount` = 0.03, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1996-12-10 00:00:00' WHERE `l_orderkey` = 1280;
UPDATE `lineitem` SET `l_partkey` = 14, `l_suppkey` = 8, `l_linenumber` = 5, `l_quantity` = 35.0, `l_extendedprice` = 55070.42, `l_discount` = 0.02, `l_tax` = 0.07, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1999-05-07 00:00:00' WHERE `l_orderkey` = 1447;
UPDATE `lineitem` SET `l_partkey` = 117, `l_suppkey` = 0, `l_linenumber` = 3, `l_quantity` = 24.0, `l_extendedprice` = 55207.02, `l_discount` = 0.08, `l_tax` = 0.03, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2001-04-05 00:00:00' WHERE `l_orderkey` = 648;
UPDATE `lineitem` SET `l_partkey` = 89, `l_suppkey` = 0, `l_linenumber` = 7, `l_quantity` = 25.0, `l_extendedprice` = 45220.29, `l_discount` = 0.04, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1999-06-28 00:00:00' WHERE `l_orderkey` = 1058;
UPDATE `lineitem` SET `l_partkey` = 12, `l_suppkey` = 8, `l_linenumber` = 7, `l_quantity` = 39.0, `l_extendedprice` = 20786.15, `l_discount` = 0.07, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1995-09-13 00:00:00' WHERE `l_orderkey` = 472;
UPDATE `lineitem` SET `l_partkey` = 11, `l_suppkey` = 7, `l_linenumber` = 5, `l_quantity` = 16.0, `l_extendedprice` = 92893.69, `l_discount` = 0.02, `l_tax` = 0.0, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-12-12 00:00:00' WHERE `l_orderkey` = 177;
UPDATE `lineitem` SET `l_partkey` = 141, `l_suppkey` = 2, `l_linenumber` = 6, `l_quantity` = 49.0, `l_extendedprice` = 26508.28, `l_discount` = 0.03, `l_tax` = 0.05, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1996-12-17 00:00:00' WHERE `l_orderkey` = 1035;
UPDATE `lineitem` SET `l_partkey` = 154, `l_suppkey` = 3, `l_linenumber` = 2, `l_quantity` = 23.0, `l_extendedprice` = 65852.32, `l_discount` = 0.09, `l_tax` = 0.01, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2000-05-12 00:00:00' WHERE `l_orderkey` = 736;
UPDATE `lineitem` SET `l_partkey` = 38, `l_suppkey` = 7, `l_linenumber` = 2, `l_quantity` = 7.0, `l_extendedprice` = 78445.3, `l_discount` = 0.0, `l_tax` = 0.02, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2000-09-18 00:00:00' WHERE `l_orderkey` = 1332;
UPDATE `lineitem` SET `l_partkey` = 171, `l_suppkey` = 0, `l_linenumber` = 2, `l_quantity` = 4.0, `l_extendedprice` = 36348.9, `l_discount` = 0.02, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1996-09-23 00:00:00' WHERE `l_orderkey` = 298;
UPDATE `lineitem` SET `l_partkey` = 115, `l_suppkey` = 2, `l_linenumber` = 1, `l_quantity` = 3.0, `l_extendedprice` = 59648.94, `l_discount` = 0.05, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '2001-09-27 00:00:00' WHERE `l_orderkey` = 349;
UPDATE `lineitem` SET `l_partkey` = 81, `l_suppkey` = 6, `l_linenumber` = 3, `l_quantity` = 6.0, `l_extendedprice` = 70648.82, `l_discount` = 0.05, `l_tax` = 0.06, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1996-02-22 00:00:00' WHERE `l_orderkey` = 1388;
UPDATE `lineitem` SET `l_partkey` = 185, `l_suppkey` = 2, `l_linenumber` = 6, `l_quantity` = 50.0, `l_extendedprice` = 32109.81, `l_discount` = 0.05, `l_tax` = 0.04, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '1995-08-02 00:00:00' WHERE `l_orderkey` = 1204;
UPDATE `lineitem` SET `l_partkey` = 105, `l_suppkey` = 8, `l_linenumber` = 3, `l_quantity` = 16.0, `l_extendedprice` = 49717.19, `l_discount` = 0.02, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1995-08-16 00:00:00' WHERE `l_orderkey` = 1298;
UPDATE `lineitem` SET `l_partkey` = 12, `l_suppkey` = 4, `l_linenumber` = 1, `l_quantity` = 39.0, `l_extendedprice` = 28746.51, `l_discount` = 0.05, `l_tax` = 0.02, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1997-01-22 00:00:00' WHERE `l_orderkey` = 400;
UPDATE `lineitem` SET `l_partkey` = 88, `l_suppkey` = 2, `l_linenumber` = 5, `l_quantity` = 50.0, `l_extendedprice` = 58801.3, `l_discount` = 0.04, `l_tax` = 0.02, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1995-06-21 00:00:00' WHERE `l_orderkey` = 1364;
UPDATE `lineitem` SET `l_partkey` = 101, `l_suppkey` = 5, `l_linenumber` = 1, `l_quantity` = 34.0, `l_extendedprice` = 22871.71, `l_discount` = 0.02, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '1996-09-23 00:00:00' WHERE `l_orderkey` = 258;
UPDATE `lineitem` SET `l_partkey` = 161, `l_suppkey` = 6, `l_linenumber` = 7, `l_quantity` = 5.0, `l_extendedprice` = 100470.78, `l_discount` = 0.06, `l_tax` = 0.07, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2001-06-30 00:00:00' WHERE `l_orderkey` = 944;
UPDATE `lineitem` SET `l_partkey` = 96, `l_suppkey` = 4, `l_linenumber` = 6, `l_quantity` = 35.0, `l_extendedprice` = 91002.47, `l_discount` = 0.02, `l_tax` = 0.07, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2000-11-25 00:00:00' WHERE `l_orderkey` = 720;
UPDATE `lineitem` SET `l_partkey` = 178, `l_suppkey` = 5, `l_linenumber` = 4, `l_quantity` = 17.0, `l_extendedprice` = 1651.25, `l_discount` = 0.07, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '2000-03-13 00:00:00' WHERE `l_orderkey` = 89;
UPDATE `lineitem` SET `l_partkey` = 104, `l_suppkey` = 0, `l_linenumber` = 5, `l_quantity` = 10.0, `l_extendedprice` = 77128.18, `l_discount` = 0.02, `l_tax` = 0.06, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '1995-06-29 00:00:00' WHERE `l_orderkey` = 1465;
UPDATE `lineitem` SET `l_partkey` = 172, `l_suppkey` = 3, `l_linenumber` = 1, `l_quantity` = 46.0, `l_extendedprice` = 77445.98, `l_discount` = 0.05, `l_tax` = 0.06, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2001-03-30 00:00:00' WHERE `l_orderkey` = 50;
UPDATE `lineitem` SET `l_partkey` = 154, `l_suppkey` = 5, `l_linenumber` = 1, `l_quantity` = 12.0, `l_extendedprice` = 4781.94, `l_discount` = 0.08, `l_tax` = 0.07, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1997-04-11 00:00:00' WHERE `l_orderkey` = 1180;
UPDATE `lineitem` SET `l_partkey` = 153, `l_suppkey` = 4, `l_linenumber` = 5, `l_quantity` = 2.0, `l_extendedprice` = 8153.82, `l_discount` = 0.06, `l_tax` = 0.03, `l_returnflag` = 'R', `l_linestatus` = 'F', `l_shipdate` = '2001-04-19 00:00:00' WHERE `l_orderkey` = 494;
UPDATE `lineitem` SET `l_partkey` = 191, `l_suppkey` = 8, `l_linenumber` = 4, `l_quantity` = 1.0, `l_extendedprice` = 21956.44, `l_discount` = 0.01, `l_tax` = 0.01, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '1998-12-11 00:00:00' WHERE `l_orderkey` = 1462;
UPDATE `lineitem` SET `l_partkey` = 22, `l_suppkey` = 8, `l_linenumber` = 3, `l_quantity` = 7.0, `l_extendedprice` = 84829.96, `l_discount` = 0.07, `l_tax` = 0.05, `l_returnflag` = 'R', `l_linestatus` = 'O', `l_shipdate` = '2000-04-17 00:00:00' WHERE `l_orderkey` = 1160;
UPDATE `lineitem` SET `l_partkey` = 67, `l_suppkey` = 8, `l_linenumber` = 4, `l_quantity` = 6.0, `l_extendedprice` = 104314.8, `l_discount` = 0.07, `l_tax` = 0.01, `l_returnflag` = 'A', `l_linestatus` = 'O', `l_shipdate` = '2001-01-24 00:00:00' WHERE `l_orderkey` = 1426;
UPDATE `lineitem` SET `l_partkey` = 161, `l_suppkey` = 6, `l_linenumber` = 5, `l_quantity` = 24.0, `l_extendedprice` = 1047.03, `l_discount` = 0.07, `l_tax` = 0.02, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1997-06-23 00:00:00' WHERE `l_orderkey` = 59;
UPDATE `lineitem` SET `l_partkey` = 159, `l_suppkey` = 6, `l_linenumber` = 6, `l_quantity` = 46.0, `l_extendedprice` = 68536.65, `l_discount` = 0.04, `l_tax` = 0.01, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1996-02-25 00:00:00' WHERE `l_orderkey` = 732;
UPDATE `lineitem` SET `l_partkey` = 107, `l_suppkey` = 8, `l_linenumber` = 4, `l_quantity` = 41.0, `l_extendedprice` = 38412.64, `l_discount` = 0.01, `l_tax` = 0.05, `l_returnflag` = 'A', `l_linestatus` = 'F', `l_shipdate` = '2000-05-01 00:00:00' WHERE `l_orderkey` = 745;
UPDATE `lineitem` SET `l_partkey` = 24, `l_suppkey` = 4, `l_linenumber` = 5, `l_quantity` = 50.0, `l_extendedprice` = 76641.76, `l_discount` = 0.07, `l_tax` = 0.02, `l_returnflag` = 'N', `l_linestatus` = 'O', `l_shipdate` = '2000-03-09 00:00:00' WHERE `l_orderkey` = 458;
UPDATE `lineitem` SET `l_partkey` = 32, `l_suppkey` = 2, `l_linenumber` = 6, `l_quantity` = 50.0, `l_extendedprice` = 96218.42, `l_discount` = 0.05, `l_tax` = 0.03, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1999-01-22 00:00:00' WHERE `l_orderkey` = 1142;
UPDATE `lineitem` SET `l_partkey` = 109, `l_suppkey` = 2, `l_linenumber` = 5, `l_quantity` = 14.0, `l_extendedprice` = 27500.25, `l_discount` = 0.02, `l_tax` = 0.0, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1996-10-26 00:00:00' WHERE `l_orderkey` = 1287;
UPDATE `lineitem` SET `l_partkey` = 10, `l_suppkey` = 7, `l_linenumber` = 3, `l_quantity` = 43.0, `l_extendedprice` = 64561.63, `l_discount` = 0.08, `l_tax` = 0.06, `l_returnflag` = 'N', `l_linestatus` = 'F', `l_shipdate` = '1998-10-19 00:00:00' WHERE `l_orderkey` = 116;

-- Updating 1 records in nation
UPDATE `nation` SET `n_name` = 'NATION_12', `n_regionkey` = 2 WHERE `n_nationkey` = 12;

-- Updating 10 records in part
UPDATE `part` SET `p_name` = 'large widget', `p_brand` = 'Brand#8', `p_type` = 'ECONOMY', `p_size` = 29, `p_retailprice` = 900.3 WHERE `p_partkey` = 3;
UPDATE `part` SET `p_name` = 'blue ring', `p_brand` = 'Brand#20', `p_type` = 'SMALL', `p_size` = 40, `p_retailprice` = 903.0 WHERE `p_partkey` = 30;
UPDATE `part` SET `p_name` = 'cold gear', `p_brand` = 'Brand#5', `p_type` = 'ECONOMY', `p_size` = 16, `p_retailprice` = 904.5 WHERE `p_partkey` = 45;
UPDATE `part` SET `p_name` = 'red bolt', `p_brand` = 'Brand#7', `p_type` = 'SMALL', `p_size` = 46, `p_retailprice` = 907.6 WHERE `p_partkey` = 76;
UPDATE `part` SET `p_name` = 'blue ring', `p_brand` = 'Brand#10', `p_type` = 'STANDARD', `p_size` = 50, `p_retailprice` = 912.8 WHERE `p_partkey` = 128;
UPDATE `part` SET `p_name` = 'blue widget', `p_brand` = 'Brand#15', `p_type` = 'STANDARD', `p_size` = 15, `p_retailprice` = 913.0 WHERE `p_partkey` = 130;
UPDATE `part` SET `p_name` = 'hot gear', `p_brand` = 'Brand#1', `p_type` = 'SMALL', `p_size` = 49, `p_retailprice` = 913.6 WHERE `p_partkey` = 136;
UPDATE `part` SET `p_name` = 'hot widget', `p_brand` = 'Brand#15', `p_type` = 'PROMO', `p_size` = 44, `p_retailprice` = 915.8 WHERE `p_partkey` = 158;
UPDATE `part` SET `p_name` = 'large gizmo', `p_brand` = 'Brand#25', `p_type` = 'LARGE', `p_size` = 37, `p_retailprice` = 916.7 WHERE `p_partkey` = 167;
UPDATE `part` SET `p_name` = 'red rod', `p_brand` = 'Brand#22', `p_type` = 'PROMO', `p_size` = 16, `p_retailprice` = 917.0 WHERE `p_partkey` = 170;

-- INSERT Missing Records
-- ======================
-- Records that exist in production but not in backup

-- Inserting 7 missing records into customer
INSERT INTO `customer` VALUES (61, 'Customer#000000061', 18, 9544.14, 'HOUSEHOLD');
INSERT INTO `customer` VALUES (63, 'Customer#000000063', 24, 7610.08, 'FURNITURE');
INSERT INTO `customer` VALUES (75, 'Customer#000000075', 11, 8089.2, 'AUTOMOBILE');
INSERT INTO `customer` VALUES (109, 'Customer#000000109', 17, 7492.13, 'FURNITURE');
INSERT INTO `customer` VALUES (130, 'Customer#000000130', 14, 1526.22, 'BUILDING');
INSERT INTO `customer` VALUES (133, 'Customer#000000133', 13, 340.17, 'BUILDING');
INSERT INTO `customer` VALUES (134, 'Customer#000000134', 19, 4569.63, 'MACHINERY');

-- Inserting 75 missing records into orders
INSERT INTO `orders` VALUES (68, 53, 'P', 5300.01, '1995-06-26 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (98, 66, 'P', 269181.35, '1996-06-14 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (132, 1, 'P', 202733.95, '1998-06-11 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (133, 90, 'P', 291906.15, '2001-01-08 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (134, 86, 'F', 293010.48, '1998-01-29 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (157, 14, 'O', 361936.85, '1998-06-12 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (182, 101, 'P', 106658.81, '1995-08-21 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (213, 126, 'F', 414714.7, '2000-09-15 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (294, 54, 'F', 176260.24, '1995-11-08 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (297, 18, 'P', 246926.06, '1996-10-20 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (307, 83, 'F', 114939.78, '1997-11-05 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (315, 17, 'P', 42131.57, '1998-06-09 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (346, 139, 'F', 198879.81, '1995-06-02 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (359, 138, 'P', 291417.57, '1996-07-25 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (373, 68, 'O', 128307.2, '1997-05-08 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (374, 119, 'O', 256060.74, '2001-03-22 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (383, 138, 'O', 197257.64, '1998-04-06 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (386, 62, 'O', 266837.47, '1997-09-09 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (391, 98, 'O', 446349.68, '1996-09-26 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (397, 142, 'O', 125585.52, '1995-04-14 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (405, 126, 'O', 256632.23, '1997-12-24 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (434, 88, 'P', 17435.07, '2000-01-31 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (444, 104, 'P', 263021.52, '2000-05-28 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (491, 142, 'O', 165061.18, '2001-05-14 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (510, 105, 'P', 369798.24, '2000-01-25 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (513, 91, 'F', 406445.65, '1999-04-06 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (526, 66, 'F', 217066.11, '1995-05-21 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (547, 72, 'P', 159543.45, '1995-06-26 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (549, 68, 'P', 208011.15, '1996-03-04 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (550, 104, 'P', 62804.58, '1998-02-22 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (558, 69, 'P', 125524.54, '1995-12-30 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (597, 139, 'F', 267160.33, '1998-04-18 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (602, 140, 'F', 427342.0, '2000-09-18 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (608, 71, 'P', 337398.01, '1998-06-08 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (632, 4, 'F', 399377.06, '2000-02-23 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (640, 48, 'F', 168854.16, '1997-04-06 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (682, 76, 'P', 105833.47, '1997-09-14 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (701, 129, 'O', 474125.69, '1996-08-21 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (705, 80, 'P', 197231.82, '1997-08-29 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (722, 107, 'O', 3487.5, '1997-04-11 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (760, 68, 'F', 453496.82, '2001-07-13 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (762, 92, 'F', 305868.38, '2001-02-14 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (785, 72, 'O', 476648.68, '1995-05-29 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (789, 62, 'F', 320831.89, '1996-05-01 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (845, 63, 'P', 491133.12, '2000-09-18 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (876, 68, 'O', 14401.03, '1998-01-06 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (879, 18, 'O', 324290.86, '2000-07-28 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (927, 129, 'F', 459660.79, '1996-11-26 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (933, 61, 'F', 439832.28, '1997-05-04 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (1007, 111, 'O', 354132.77, '2000-08-14 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (1008, 22, 'P', 400873.12, '1999-12-22 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (1062, 136, 'P', 457783.07, '2001-07-14 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (1068, 19, 'P', 278859.38, '1997-12-03 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (1082, 141, 'F', 55974.85, '2000-08-27 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (1113, 142, 'O', 462220.59, '1995-10-13 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (1117, 121, 'O', 492319.08, '1996-02-03 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (1122, 87, 'P', 161847.05, '1997-10-20 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (1141, 6, 'F', 468845.06, '2001-01-10 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (1162, 108, 'F', 454616.46, '1999-01-12 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (1164, 10, 'P', 282583.81, '1997-11-28 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (1168, 106, 'O', 281928.14, '2000-07-31 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (1181, 42, 'P', 358811.43, '1998-12-03 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (1212, 114, 'F', 77610.62, '1999-03-29 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (1229, 66, 'P', 165682.15, '1995-03-13 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (1289, 56, 'O', 467839.88, '2000-06-05 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (1303, 65, 'O', 160971.45, '1996-02-03 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (1319, 77, 'P', 294921.39, '1998-04-07 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (1331, 63, 'F', 175671.57, '1998-01-09 00:00:00', '5-LOW');
INSERT INTO `orders` VALUES (1349, 71, 'F', 120996.3, '1998-07-07 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (1357, 117, 'O', 148831.11, '1995-09-15 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (1365, 94, 'F', 369190.73, '1998-04-02 00:00:00', '2-HIGH');
INSERT INTO `orders` VALUES (1401, 40, 'O', 365402.62, '1996-12-23 00:00:00', '1-URGENT');
INSERT INTO `orders` VALUES (1409, 29, 'P', 410043.66, '1996-08-12 00:00:00', '3-MEDIUM');
INSERT INTO `orders` VALUES (1425, 71, 'O', 106385.67, '1999-06-27 00:00:00', '4-NOT SPECIFIED');
INSERT INTO `orders` VALUES (1441, 72, 'O', 131565.8, '1995-08-05 00:00:00', '1-URGENT');

-- Inserting 6 missing records into lineitem
INSERT INTO `lineitem` VALUES (705, 112, 4, 5, 14.0, 5839.67, 0.05, 0.06, 'A', 'O', '1998-08-12 00:00:00');
INSERT INTO `lineitem` VALUES (1183, 42, 7, 3, 29.0, 12193.36, 0.04, 0.06, 'N', 'F', '1996-10-28 00:00:00');
INSERT INTO `lineitem` VALUES (1099, 22, 5, 7, 44.0, 9039.23, 0.05, 0.06, 'R', 'O', '1996-02-05 00:00:00');
INSERT INTO `lineitem` VALUES (747, 192, 7, 3, 16.0, 21653.78, 0.05, 0.03, 'A', 'O', '1996-08-26 00:00:00');
INSERT INTO `lineitem` VALUES (1463, 1, 1, 7, 19.0, 61905.58, 0.02, 0.03, 'N', 'O', '2001-02-27 00:00:00');
INSERT INTO `lineitem` VALUES (717, 142, 9, 1, 35.0, 5748.61, 0.08, 0.02, 'A', 'O', '2000-06-05 00:00:00');

-- Inserting 1 missing records into nation
INSERT INTO `nation` VALUES (16, 'NATION_16', 1);

-- Inserting 10 missing records into part
INSERT INTO `part` VALUES (2, 'large bolt', 'Brand#19', 'PROMO', 9, 900.2);
INSERT INTO `part` VALUES (13, 'large anvil', 'Brand#10', 'MEDIUM', 22, 901.3);
INSERT INTO `part` VALUES (44, 'hot plate', 'Brand#12', 'ECONOMY', 49, 904.4);
INSERT INTO `part` VALUES (64, 'red plate', 'Brand#9', 'PROMO', 21, 906.4);
INSERT INTO `part` VALUES (66, 'cold gear', 'Brand#21', 'SMALL', 28, 906.6);
INSERT INTO `part` VALUES (101, 'large plate', 'Brand#17', 'ECONOMY', 1, 910.1);
INSERT INTO `part` VALUES (111, 'old bolt', 'Brand#9', 'STANDARD', 13, 911.1);
INSERT INTO `part` VALUES (121, 'blue gizmo', 'Brand#13', 'MEDIUM', 43, 912.1);
INSERT INTO `part` VALUES (187, 'red bolt', 'Brand#19', 'MEDIUM', 26, 918.7);
INSERT INTO `part` VALUES (193, 'cold rod', 'Brand#17', 'ECONOMY', 1, 919.3);

-- CRUD Statistics Summary
-- =======================

-- Records to INSERT: 99
-- Records to UPDATE: 232
-- Records to DELETE: 393
-- Total operations: 724

-- Per-Table Statistics:
-- customer:
--   Production: 150 records
--   Backup: 150 records
--   To INSERT: 7 records
--   To UPDATE: 7 records
--   To DELETE: 7 records
-- orders:
--   Production: 1500 records
--   Backup: 1500 records
--   To INSERT: 75 records
--   To UPDATE: 75 records
--   To DELETE: 75 records
-- lineitem:
--   Production: 1473 records
--   Backup: 1767 records
--   To INSERT: 6 records
--   To UPDATE: 139 records
--   To DELETE: 300 records
-- nation:
--   Production: 25 records
--   Backup: 25 records
--   To INSERT: 1 records
--   To UPDATE: 1 records
--   To DELETE: 1 records
-- part:
--   Production: 200 records
--   Backup: 200 records
--   To INSERT: 10 records
--   To UPDATE: 10 records
--   To DELETE: 10 records